"""Pallas TPU flash attention (forward + backward) for the unet's multi-query attention.

The reference materializes the full (b, h, i, j) similarity matrix
(imagen_pytorch.py:565,583) — at SR-stage resolutions the flattened-pixel sequence is
64^2..256^2 tokens, so that matrix dominates HBM traffic. These kernels compute the
same cosine-sim multi-query attention with online (streaming) softmax over key
blocks: the (bi, bj) similarity tile lives only in VMEM, accumulators are fp32, and
neither the forward nor the backward ever materializes an (n, n) tensor in HBM.

Rows layout — the TPU-native trick: multi-query attention (single KV head shared by
all query heads, reference imagen_pytorch.py:522) is mathematically plain
single-head attention over R = n*h INDEPENDENT rows. The module's packed
(b, n, h*d) activations reshape to rows (b, n*h, d) for free (contiguous memory),
so the kernels take q as (b, R, d) and the `b n (h d) -> b h n d` / inverse
head transposes — real HBM relayout passes, ~6% of sampler device time in the
round-2 profile — disappear entirely. Heads only exist in the row ORDER, which
both softmax and the backward reduction are invariant to.

    q: (b, R, d)      — R query rows (any interleaving of pixels x heads)
    k: (b, nk, d)     — single shared KV head
    v: (b, nk, d)

Softmax uses exp2 with scale*log2(e) folded into the q prologue (the VPU's native
exponential; saves the separate full-tile `* scale` pass). The saved row
logsumexp L is therefore in the BASE-2 scaled domain; the backward uses the same
convention, so P = exp2(s2 - L2) is the exact softmax weight.

Backward (FlashAttention-2 recomputation scheme, rows form):
    D_r  = rowsum(dO_r * O_r)                       (precomputed by XLA, fused)
    P    = exp2(S2 - L2)  recomputed per tile
    dV   = P^T dO       dP = dO V^T
    dS   = P * (dP - D) * scale
    dQ   = dS K         dK = dS^T Q
Two kernels: dq (grid (b, row-blocks, k-blocks), VMEM scratch accumulator) and dkv
(grid (b, k-blocks, row-blocks), accumulating into revisited output blocks — in the
rows form the multi-query head reduction is just the reduction over all rows).

The cosine-sim prologue (l2norm + learned per-dim gains, reference :566-570) is
fused into the forward kernel; the backward recomputes normalized q/k with XLA
(cheap elementwise) and chains the l2norm VJP outside the kernels.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Minimum query length for the flash path to pay off (below this the sim matrix is
# tiny and XLA's fused path is faster to compile and run).
FLASH_MIN_SEQ = 1024

_NEG_INF = -1e30
_LOG2E = math.log2(math.e)

# module-level interpret toggle so the custom_vjp-wrapped public entry points can be
# exercised on CPU in tests
_INTERPRET = False


def _pick_block_q(rows):
    """Largest well-shaped row-block that tiles the row axis; None if nothing fits."""
    for bq in (512, 256, 128):
        if rows % bq == 0:
            return bq
    return None


# One-shot path: when the whole padded key axis fits one block, skip the online-softmax
# rescaling entirely (single tile, plain softmax). The similarity tile is
# block_q x nk_pad fp32 in VMEM; cap its footprint well under the ~16 MB/core VMEM.
_ONESHOT_MAX_NK = 2048
_ONESHOT_TILE_BUDGET = 6 * 1024 * 1024  # bytes for the fp32 (block_q, nk_pad) tile

# Middle tier: whole padded K/V resident in VMEM, fori_loop over key blocks inside
# one program per (batch, row-block). Avoids the grid-streamed tier's per-program
# overhead (scratch init/finalize + grid bookkeeping x num_kb) — measured 17%
# faster at the SR-1024 bottom attention (R=131072, nk=16386 on v5e). Budget is
# for the k + v blocks (bf16), leaving room for the (block_q, block_k) sim tile
# and double-buffered q/o under the ~16 MB/core VMEM.
_LOOP_KV_BUDGET = 5 * 1024 * 1024


def _oneshot_block_q(rows, nk_pad):
    """Largest row-block for the one-shot path within the VMEM tile budget."""
    for bq in (1024, 512, 256, 128):
        if rows % bq == 0 and bq * nk_pad * 4 <= _ONESHOT_TILE_BUDGET:
            return bq
    return None


def _l2norm_scale(x, gain, eps=1e-12):
    """Row l2-normalize (+ learned per-dim gain) in fp32 — the cosine-sim attention
    prologue (reference imagen_pytorch.py:566-570) fused into the kernel so the
    normalized q/k never round-trip HBM."""
    xf = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(jnp.maximum(
        jnp.sum(xf * xf, axis=-1, keepdims=True), eps))
    return (xf * inv * gain).astype(x.dtype)


def _q_prologue(q, q_scale_ref, scale, fuse_l2norm):
    """Apply the cosine l2norm+gain (fused path) or plain scaling on the small
    (block_q, d) query tile, with scale*log2e folded in so the sim tile needs no
    separate scaling pass and exp2 is the direct exponential."""
    s2 = scale * _LOG2E
    if fuse_l2norm:
        return _l2norm_scale(q, q_scale_ref[0].astype(jnp.float32) * s2)
    return (q.astype(jnp.float32) * s2).astype(q.dtype)


def _flash_rows_kernel(q_ref, k_ref, v_ref, o_ref, l_ref=None, *, scale, nk,
                       fuse_l2norm, q_scale_ref=None, bias_ref=None):
    """One-shot program: the whole padded key axis is a single block, so the
    online-softmax rescaling collapses to one plain softmax over the full
    similarity tile — measured ~27% faster at the unet's 32x32 attention shape
    (n=1024, nk=1281 on v5e) than streaming 512-wide key blocks.

    Matmuls keep their input dtype (bf16 runs the MXU at full rate) and accumulate
    fp32 via preferred_element_type; softmax statistics stay fp32. Keys arrive
    pre-normalized on the cosine path (the k l2norm is a single fused XLA pass
    outside the kernel — re-normalizing per program wastes VPU time); only the
    q-norm is fused here, since q is loaded exactly once per program.
    """
    q = _q_prologue(q_ref[0], q_scale_ref, scale, fuse_l2norm)  # (bi, d)
    bi = q.shape[0]
    nk_pad = k_ref.shape[1]

    s = jax.lax.dot_general(
        q, k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)               # base-2 scaled domain
    if bias_ref is not None:
        # additive bias already in the base-2 domain; its pad columns carry
        # _NEG_INF so the explicit pad mask below is subsumed
        s = s + bias_ref[0]
    elif nk != nk_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, (bi, nk_pad), 1)
        s = jnp.where(col < nk, s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    acc = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    if l_ref is not None:
        l_ref[0, 0] = (m + jnp.log2(l))[:, 0]   # row log2-sum-exp2, scaled domain


def _flash_rows_stream_kernel(q_ref, k_ref, v_ref, o_ref, l_ref,
                              acc_ref, m_ref, sum_ref, *, scale, nk, block_k,
                              num_kb, fuse_l2norm, q_scale_ref=None):
    """Grid-streamed program: grid (b, row-blocks, K-BLOCKS) with the key axis as
    the innermost grid dimension and fp32 accumulators in VMEM scratch. Unlike a
    whole-key-resident block, VMEM usage is bounded by block_k regardless of
    sequence length (a 16k-frame-token video unet OOMed the 16 MB scoped VMEM
    with whole-k blocks: 2 x double-buffered (nk, d) + the sim tile)."""
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        sum_ref[...] = jnp.zeros_like(sum_ref)

    q = _q_prologue(q_ref[0], q_scale_ref, scale, fuse_l2norm)
    bi = q.shape[0]

    kblk = k_ref[0]                                   # (block_k, d)
    vblk = v_ref[0]

    s = jax.lax.dot_general(
        q, kblk, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)           # (bi, block_k), base-2 domain

    if nk % block_k:  # padding exists in the final block; the select is a no-op
        # on earlier blocks (cheaper than branching per grid step)
        col = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (bi, block_k), 1)
        s = jnp.where(col < nk, s, _NEG_INF)

    # stat scratch is (block_q, 128) to satisfy TPU lane tiling; column 0 is live
    m_prev = m_ref[...]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp2(s - m_new[:, 0:1])
    alpha = jnp.exp2(m_prev[:, 0:1] - m_new[:, 0:1])
    sum_ref[...] = sum_ref[...] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    m_ref[...] = m_new
    acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
        p.astype(vblk.dtype), vblk, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(kb == num_kb - 1)
    def _():
        o_ref[0] = (acc_ref[...] / sum_ref[:, 0:1]).astype(o_ref.dtype)
        if l_ref is not None:
            l_ref[0, 0] = m_ref[:, 0] + jnp.log2(sum_ref[:, 0])


def _flash_rows_loop_kernel(q_ref, k_ref, v_ref, o_ref, l_ref=None, *, scale, nk,
                            block_k, num_kb, fuse_l2norm, q_scale_ref=None,
                            bias_ref=None):
    """Loop-resident program: whole padded K/V live in VMEM; an in-kernel
    fori_loop streams key blocks through the online softmax. One program per
    (batch, row-block) — no per-k-block grid overhead. Used when K/V fit the
    _LOOP_KV_BUDGET; beyond that the grid-streamed kernel bounds VMEM."""
    q = _q_prologue(q_ref[0], q_scale_ref, scale, fuse_l2norm)
    bi, d = q.shape

    def body(jb, carry):
        acc, m, l = carry
        kblk = k_ref[0, pl.ds(jb * block_k, block_k), :]
        vblk = v_ref[0, pl.ds(jb * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, kblk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if bias_ref is not None:
            # base-2-domain additive bias; pad columns carry _NEG_INF
            s = s + bias_ref[0, :, pl.ds(jb * block_k, block_k)]
        elif nk % block_k:
            col = jb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (bi, block_k), 1)
            s = jnp.where(col < nk, s, _NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp2(s - m_new)
        alpha = jnp.exp2(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p.astype(vblk.dtype), vblk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc_new, m_new, l_new

    acc0 = jnp.zeros((bi, d), jnp.float32)
    m0 = jnp.full((bi, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((bi, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_kb, body, (acc0, m0, l0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    if l_ref is not None:
        l_ref[0, 0] = (m + jnp.log2(l))[:, 0]


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _flash_rows_forward(q, k, v, scale, block_q=None, block_k=512, interpret=False,
                        q_scale=None, k_scale=None, return_stats=False,
                        bias=None, _force_tier=None):
    """q: (b, R, d) rows; k/v: (b, nk, d) shared KV head.

    q_scale/k_scale given => fuse the cosine-sim l2norm+gain into the kernel.
    return_stats=True additionally returns the per-row log2-sum-exp2 L (b, R) fp32
    (base-2 scaled domain) needed by the flash backward.
    bias: optional (R, nk) fp32 additive bias in the BASE-2 scaled domain (i.e.
    already multiplied by log2(e)), shared across the batch dim; -inf entries
    mask. One-shot tier only (used by the grouped temporal-attention path)."""
    b, rows, d = q.shape
    nk = k.shape[1]
    fuse = q_scale is not None

    if fuse:
        # k l2norm+gain once, outside the kernel (one fused XLA pass over the
        # single shared KV head; recomputing it per program would redo it
        # b*(R/block_q) times on the VPU)
        k = _xla_l2norm_scale(k, k_scale)

    nk_pad128 = _round_up(nk, 128)
    oneshot_bq = (_oneshot_block_q(rows, nk_pad128)
                  if nk_pad128 <= _ONESHOT_MAX_NK else None)
    oneshot = block_q is None and oneshot_bq is not None
    if oneshot:
        block_q, block_k = oneshot_bq, nk_pad128
    else:
        block_q = block_q if block_q is not None else _pick_block_q(rows)
        block_q = min(block_q, rows)
        block_k = min(block_k, nk_pad128)
    assert rows % block_q == 0, f'{rows} rows must divide block_q {block_q}'

    nk_pad = _round_up(nk, block_k)
    if nk_pad != nk:
        pad = ((0, 0), (0, nk_pad - nk), (0, 0))
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    num_kb = nk_pad // block_k

    out_shape = jax.ShapeDtypeStruct((b, rows, d), q.dtype)
    if oneshot:
        grid = (b, rows // block_q)
        q_spec = pl.BlockSpec((1, block_q, d), lambda bb, i: (bb, i, 0))
        kv_spec = pl.BlockSpec((1, nk_pad, d), lambda bb, i: (bb, 0, 0))
        qs_spec = pl.BlockSpec((1, d), lambda bb, i: (0, 0))
        out_spec = q_spec
        # stats carry a singleton axis so the block's dim -2 is array-equal
        # (TPU tiling rule: last two block dims divisible by (8, 128) or equal)
        lse_spec = pl.BlockSpec((1, 1, block_q), lambda bb, i: (bb, 0, i))
        kern = functools.partial(
            _flash_rows_kernel, scale=scale, nk=nk, fuse_l2norm=fuse)
        scratch_shapes = []
    elif _force_tier != 'stream' and (
            _force_tier == 'loop'
            or 2 * nk_pad * d * jnp.dtype(q.dtype).itemsize <= _LOOP_KV_BUDGET):
        # middle tier: whole K/V resident, fori_loop over key blocks in-kernel
        grid = (b, rows // block_q)
        q_spec = pl.BlockSpec((1, block_q, d), lambda bb, i: (bb, i, 0))
        kv_spec = pl.BlockSpec((1, nk_pad, d), lambda bb, i: (bb, 0, 0))
        qs_spec = pl.BlockSpec((1, d), lambda bb, i: (0, 0))
        out_spec = q_spec
        lse_spec = pl.BlockSpec((1, 1, block_q), lambda bb, i: (bb, 0, i))
        kern = functools.partial(
            _flash_rows_loop_kernel, scale=scale, nk=nk, block_k=block_k,
            num_kb=num_kb, fuse_l2norm=fuse)
        scratch_shapes = []
        oneshot = True  # same grid arity/wrapper shape as the one-shot tier
    else:
        # key axis streamed through the grid; accumulators live in VMEM scratch,
        # so VMEM is bounded by block_k regardless of nk
        grid = (b, rows // block_q, num_kb)
        q_spec = pl.BlockSpec((1, block_q, d), lambda bb, i, kb: (bb, i, 0))
        kv_spec = pl.BlockSpec((1, block_k, d), lambda bb, i, kb: (bb, kb, 0))
        qs_spec = pl.BlockSpec((1, d), lambda bb, i, kb: (0, 0))
        out_spec = pl.BlockSpec((1, block_q, d), lambda bb, i, kb: (bb, i, 0))
        lse_spec = pl.BlockSpec((1, 1, block_q), lambda bb, i, kb: (bb, 0, i))
        kern = functools.partial(
            _flash_rows_stream_kernel, scale=scale, nk=nk, block_k=block_k,
            num_kb=num_kb, fuse_l2norm=fuse)
        scratch_shapes = [pltpu.VMEM((block_q, d), jnp.float32),
                          pltpu.VMEM((block_q, 128), jnp.float32),
                          pltpu.VMEM((block_q, 128), jnp.float32)]

    in_specs = [q_spec, kv_spec, kv_spec]
    args = [q, k, v]
    if fuse:
        in_specs += [qs_spec]
        args += [q_scale.reshape(1, d)]
    has_bias = bias is not None
    if has_bias:
        # works on the whole-key-resident tiers (one-shot and loop; `oneshot` is
        # True for both here — the loop branch adopts the same wrapper arity);
        # the bias block is row-block x full padded keys, so cap its VMEM size
        assert oneshot and nk_pad <= _ONESHOT_MAX_NK, \
            'additive bias needs a whole-key-resident tier with small nk'
        bias_p = jnp.full((rows, nk_pad), _NEG_INF, jnp.float32)
        bias_p = bias_p.at[:, :nk].set(bias.astype(jnp.float32))
        in_specs += [pl.BlockSpec((1, block_q, nk_pad), lambda bb, i: (0, i, 0))]
        args += [bias_p[None]]

    if return_stats:
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((b, 1, rows), jnp.float32)]
        out_spec = [out_spec, lse_spec]

    n_in = 3 + int(fuse) + int(has_bias)
    n_out = 2 if return_stats else 1

    def kernel(*refs):
        ins, outs, scr = refs[:n_in], refs[n_in:n_in + n_out], refs[n_in + n_out:]
        qs_ref = ins[3] if fuse else None
        b_ref = ins[3 + int(fuse)] if has_bias else None
        kw = {}
        if fuse:
            kw['q_scale_ref'] = qs_ref
        if has_bias:
            kw['bias_ref'] = b_ref
        kern(ins[0], ins[1], ins[2], outs[0],
             outs[1] if return_stats else None, *scr, **kw)

    # batch and row-block grid dims are embarrassingly parallel; the streamed key
    # dim carries the online-softmax state and must stay sequential. Declaring
    # this lets Mosaic pipeline programs more aggressively. allow_input_fusion
    # on q lets XLA fuse the packed->rows relayout (a real HBM pass otherwise)
    # into the kernel's input DMA.
    compiler_params = None
    if not interpret:
        sem = (('parallel', 'parallel') if oneshot
               else ('parallel', 'parallel', 'arbitrary'))
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=sem,
            allow_input_fusion=[True] + [False] * (len(in_specs) - 1))

    out = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
        compiler_params=compiler_params,
    )(*args)

    if return_stats:
        o, lse = out
        return o, lse.reshape(b, rows)
    return out


# --- backward kernels ----------------------------------------------------------------------

def _flash_rows_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, L_ref, D_ref, dq_ref,
                              acc_ref, *, scale, nk, block_k, num_kb):
    """dQ with the key axis streamed through the grid (b, row-blocks, K-BLOCKS);
    accumulator in VMEM scratch — bounded VMEM regardless of sequence length.

    dQ_i = sum_j [P_ij * (dO_i V_j^T - D_i)] * scale @ K_j, with P recomputed from
    the saved logsumexp — the (bi, bj) tile never leaves VMEM."""
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]                                       # (bi, d)
    do = do_ref[0]                                     # (bi, d)
    Lrow = L_ref[0, 0][:, None]                        # (bi, 1) fp32, base-2 domain
    Drow = D_ref[0, 0][:, None]                        # (bi, 1) fp32
    bi, d = q.shape
    kblk = k_ref[0]                                    # (block_k, d)
    vblk = v_ref[0]

    s = jax.lax.dot_general(
        q, kblk, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * (scale * _LOG2E)
    p = jnp.exp2(s - Lrow)                             # (bi, bj) fp32 == softmax P
    if nk % block_k:
        col = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (bi, block_k), 1)
        p = jnp.where(col < nk, p, 0.)

    dp = jax.lax.dot_general(
        do, vblk, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # (bi, bj) fp32
    ds = p * (dp - Drow) * scale

    acc_ref[...] += jax.lax.dot_general(
        ds.astype(kblk.dtype), kblk, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(kb == num_kb - 1)
    def _():
        dq_ref[0] = acc_ref[...].astype(dq_ref.dtype)


def _flash_rows_bwd_dkv_kernel(q_ref, do_ref, L_ref, D_ref, k_ref, v_ref,
                               dk_ref, dv_ref, *, scale, nk):
    """dK/dV for one (batch, k-block) output tile, accumulated over the row-block
    grid dimension (rows form: the multi-query head reduction is simply the
    reduction over all R = n*h query rows)."""
    @pl.when(pl.program_id(2) == 0)
    def _():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    q = q_ref[0]                                       # (bq, d)
    do = do_ref[0]                                     # (bq, d)
    Lrow = L_ref[0, 0][:, None]                        # (bq, 1), base-2 domain
    Drow = D_ref[0, 0][:, None]
    kblk = k_ref[0]                                    # (bk, d)
    vblk = v_ref[0]
    bq = q.shape[0]
    block_k = kblk.shape[0]

    s = jax.lax.dot_general(
        q, kblk, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * (scale * _LOG2E)
    p = jnp.exp2(s - Lrow)
    # zero out padded key columns (their dk/dv rows stay 0 and are sliced off)
    col = pl.program_id(1) * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (bq, block_k), 1)
    p = jnp.where(col < nk, p, 0.)

    # dV += P^T dO
    dv_ref[0] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dv_ref.dtype)

    dp = jax.lax.dot_general(
        do, vblk, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # (bq, bk)
    ds = p * (dp - Drow) * scale

    # dK += dS^T Q
    dk_ref[0] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dk_ref.dtype)


def _flash_rows_bwd_oneshot_kernel(q_ref, do_ref, L_ref, D_ref, k_ref, v_ref,
                                   dq_ref, dk_ref, dv_ref, *, scale, nk):
    """FUSED one-shot backward for bounded nk: the whole padded K/V is resident,
    grid is (b, row-blocks), and all five backward matmuls happen in one pass —
    S and dP are computed ONCE. The split dq/dkv streaming design recomputes
    them in both programs (7 matmuls total vs the analytic 5), which is exactly
    the measured 3x bwd/fwd ratio at the unet's hot shape (n=1024, nk=1152);
    this kernel restores the ~2.5x analytic ratio. dK/dV accumulate into
    revisited fp32 output blocks across the trailing row-block grid dim."""
    @pl.when(pl.program_id(1) == 0)
    def _():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    q = q_ref[0]                                       # (bq, d)
    do = do_ref[0]                                     # (bq, d)
    Lrow = L_ref[0, 0][:, None]                        # (bq, 1), base-2 domain
    Drow = D_ref[0, 0][:, None]
    kk = k_ref[0]                                      # (nk_pad, d)
    vv = v_ref[0]
    bq = q.shape[0]
    nk_pad = kk.shape[0]

    s = jax.lax.dot_general(
        q, kk, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * (scale * _LOG2E)
    p = jnp.exp2(s - Lrow)                             # (bq, nk_pad) == softmax P
    if nk != nk_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, (bq, nk_pad), 1)
        p = jnp.where(col < nk, p, 0.)

    # dV += P^T dO
    dv_ref[0] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dv_ref.dtype)

    dp = jax.lax.dot_general(
        do, vv, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # (bq, nk_pad)
    ds = p * (dp - Drow) * scale                       # zeros propagate to pads

    dq_ref[0] = jax.lax.dot_general(
        ds.astype(kk.dtype), kk, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dq_ref.dtype)

    # dK += dS^T Q
    dk_ref[0] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dk_ref.dtype)


def _bwd_oneshot_block_q(rows, nk_pad):
    """Largest row-block keeping the three live (block_q, nk_pad) fp32 tiles
    (P, dP, dS) within the one-shot VMEM tile budget."""
    for bq in (512, 256, 128):
        if rows % bq == 0 and 3 * bq * nk_pad * 4 <= _ONESHOT_TILE_BUDGET:
            return bq
    return None


def _flash_rows_backward_oneshot(q, k, v, do, lse, delta, scale, block_q,
                                 nk_pad, interpret=False):
    """Single fused pallas_call for the whole backward (bounded-nk tier)."""
    b, rows, d = q.shape
    nk = k.shape[1]
    if nk_pad != nk:
        pad = ((0, 0), (0, nk_pad - nk), (0, 0))
        k_p, v_p = jnp.pad(k, pad), jnp.pad(v, pad)
    else:
        k_p, v_p = k, v
    lse_r = lse.reshape(b, 1, rows)
    delta_r = delta.reshape(b, 1, rows)

    dq, dk, dv = pl.pallas_call(
        functools.partial(_flash_rows_bwd_oneshot_kernel, scale=scale, nk=nk),
        out_shape=[jax.ShapeDtypeStruct((b, rows, d), q.dtype),
                   jax.ShapeDtypeStruct((b, nk_pad, d), jnp.float32),
                   jax.ShapeDtypeStruct((b, nk_pad, d), jnp.float32)],
        grid=(b, rows // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bb, i: (bb, i, 0)),
            pl.BlockSpec((1, block_q, d), lambda bb, i: (bb, i, 0)),
            pl.BlockSpec((1, 1, block_q), lambda bb, i: (bb, 0, i)),
            pl.BlockSpec((1, 1, block_q), lambda bb, i: (bb, 0, i)),
            pl.BlockSpec((1, nk_pad, d), lambda bb, i: (bb, 0, 0)),
            pl.BlockSpec((1, nk_pad, d), lambda bb, i: (bb, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda bb, i: (bb, i, 0)),
            pl.BlockSpec((1, nk_pad, d), lambda bb, i: (bb, 0, 0)),
            pl.BlockSpec((1, nk_pad, d), lambda bb, i: (bb, 0, 0)),
        ],
        interpret=interpret,
        # dk/dv blocks are revisited (accumulated) across the row-block dim
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=('parallel', 'arbitrary')),
    )(q, do, lse_r, delta_r, k_p, v_p)

    return dq, dk[:, :nk].astype(k.dtype), dv[:, :nk].astype(v.dtype)


def _flash_rows_backward_impl(q, k, v, do, lse, delta, scale, block_q=None,
                              block_k=512, interpret=False):
    """(dq, dk, dv) via Pallas kernels, rows layout. `lse` is the base-2
    scaled-domain logsumexp and `delta` = rowsum(dO*O), both (b, R).

    Tier dispatch mirrors the forward: a fused one-shot kernel when the padded
    key axis fits VMEM (the 2D unet's shapes), else the two grid-streamed
    kernels (unbounded nk — video/SR lengths)."""
    b, rows, d = q.shape
    nk = k.shape[1]

    if block_q is None:
        nk_pad_128 = _round_up(nk, 128)
        bq_one = _bwd_oneshot_block_q(rows, nk_pad_128)
        if nk_pad_128 <= _ONESHOT_MAX_NK and bq_one is not None:
            return _flash_rows_backward_oneshot(
                q, k, v, do, lse, delta, scale, bq_one, nk_pad_128,
                interpret=interpret)

    block_q = block_q if block_q is not None else _pick_block_q(rows)
    block_q = min(block_q, rows)
    block_k = min(block_k, _round_up(nk, 128))
    assert rows % block_q == 0

    nk_pad = _round_up(nk, block_k)
    if nk_pad != nk:
        pad = ((0, 0), (0, nk_pad - nk), (0, 0))
        k_p = jnp.pad(k, pad)
        v_p = jnp.pad(v, pad)
    else:
        k_p, v_p = k, v

    lse_r = lse.reshape(b, 1, rows)
    delta_r = delta.reshape(b, 1, rows)

    # ---- dq: grid (b, row-blocks, k-blocks), accumulator in VMEM scratch ------------
    num_kb = nk_pad // block_k
    dq = pl.pallas_call(
        functools.partial(_flash_rows_bwd_dq_kernel, scale=scale, nk=nk,
                          block_k=block_k, num_kb=num_kb),
        out_shape=jax.ShapeDtypeStruct((b, rows, d), q.dtype),
        grid=(b, rows // block_q, num_kb),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bb, i, kb: (bb, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda bb, i, kb: (bb, kb, 0)),
            pl.BlockSpec((1, block_k, d), lambda bb, i, kb: (bb, kb, 0)),
            pl.BlockSpec((1, block_q, d), lambda bb, i, kb: (bb, i, 0)),
            pl.BlockSpec((1, 1, block_q), lambda bb, i, kb: (bb, 0, i)),
            pl.BlockSpec((1, 1, block_q), lambda bb, i, kb: (bb, 0, i)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bb, i, kb: (bb, i, 0)),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'arbitrary')),
    )(q, k_p, v_p, do, lse_r, delta_r)

    # ---- dk/dv: grid (b, k-blocks, row-blocks); output blocks revisited across the
    # trailing grid dim and accumulated in place
    dk, dv = pl.pallas_call(
        functools.partial(_flash_rows_bwd_dkv_kernel, scale=scale, nk=nk),
        out_shape=[jax.ShapeDtypeStruct((b, nk_pad, d), jnp.float32),
                   jax.ShapeDtypeStruct((b, nk_pad, d), jnp.float32)],
        grid=(b, nk_pad // block_k, rows // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bb, jb, qb: (bb, qb, 0)),
            pl.BlockSpec((1, block_q, d), lambda bb, jb, qb: (bb, qb, 0)),
            pl.BlockSpec((1, 1, block_q), lambda bb, jb, qb: (bb, 0, qb)),
            pl.BlockSpec((1, 1, block_q), lambda bb, jb, qb: (bb, 0, qb)),
            pl.BlockSpec((1, block_k, d), lambda bb, jb, qb: (bb, jb, 0)),
            pl.BlockSpec((1, block_k, d), lambda bb, jb, qb: (bb, jb, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda bb, jb, qb: (bb, jb, 0)),
            pl.BlockSpec((1, block_k, d), lambda bb, jb, qb: (bb, jb, 0)),
        ],
        interpret=interpret,
        # the row-block dim accumulates into revisited output blocks -> arbitrary
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'arbitrary')),
    )(q, do, lse_r, delta_r, k_p, v_p)

    dk = dk[:, :nk].astype(k.dtype)
    dv = dv[:, :nk].astype(v.dtype)
    return dq, dk, dv


def _delta(do, o):
    """D = rowsum(dO * O) in fp32 — XLA fuses this into one elementwise+reduce."""
    return jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)


# --- reference-semantics XLA fallbacks (tests + short sequences) --------------------------

def _naive_mqa(q, k, v, scale):
    """Reference-semantics attention (fp32 softmax)."""
    sim = jnp.einsum('bhid,bjd->bhij', q, k) * scale
    attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1).astype(sim.dtype)
    return jnp.einsum('bhij,bjd->bhid', attn, v)


def _xla_l2norm_scale(t, gain):
    tf = t.astype(jnp.float32)
    inv = jax.lax.rsqrt(jnp.maximum(
        jnp.sum(tf * tf, axis=-1, keepdims=True), 1e-12))
    return (tf * inv * gain).astype(t.dtype)


def _naive_cosine_mqa(q, k, v, q_scale, k_scale, scale):
    return _naive_mqa(
        _xla_l2norm_scale(q, q_scale), _xla_l2norm_scale(k, k_scale), v, scale)


# --- public entry points (custom VJP, flash both directions) -------------------------------
#
# The custom VJPs live at the ROWS level; the (b, h, n, d) entry points are free
# reshape wrappers ((b,h,n,d) -> (b, h*n, d) is a contiguous collapse).

@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_mqa_rows_cv(q, k, v, scale):
    return _flash_rows_forward(q, k, v, scale, interpret=_INTERPRET)


def _rows_fwd(q, k, v, scale):
    out, lse = _flash_rows_forward(q, k, v, scale, return_stats=True,
                                   interpret=_INTERPRET)
    return out, (q, k, v, out, lse)


def _rows_bwd(scale, residuals, g):
    q, k, v, o, lse = residuals
    return _flash_rows_backward_impl(q, k, v, g, lse, _delta(g, o), scale,
                                     interpret=_INTERPRET)


_flash_mqa_rows_cv.defvjp(_rows_fwd, _rows_bwd)


def flash_mqa_rows(q, k, v, scale):
    """Flash rows attention over pre-normalized q: q (b, R, d), k/v (b, nk, d).

    Under an active kernel mesh (`parallel.kernel_sharding`, set by the
    trainer's jitted steps) the call — forward AND custom-vjp backward — runs
    inside `shard_map` over the batch axis, so GSPMD never replicates the
    kernel's operands across data-parallel devices."""
    from imagen_tpu.parallel.kernel_sharding import shard_over_batch
    return shard_over_batch(lambda q, k, v: _flash_mqa_rows_cv(q, k, v, scale),
                            (q, k, v), (True, True, True))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _flash_cosine_mqa_rows_cv(q, k, v, q_scale, k_scale, scale):
    return _flash_rows_forward(q, k, v, scale, q_scale=q_scale, k_scale=k_scale,
                               interpret=_INTERPRET)


def _cos_rows_fwd(q, k, v, q_scale, k_scale, scale):
    out, lse = _flash_rows_forward(q, k, v, scale, q_scale=q_scale,
                                   k_scale=k_scale, return_stats=True,
                                   interpret=_INTERPRET)
    return out, (q, k, v, q_scale, k_scale, out, lse)


def _cos_rows_bwd(scale, residuals, g):
    """Backward through the fused cosine prologue: recompute normalized q/k with XLA
    (elementwise, fused), run the flash backward kernels at the normalized boundary,
    then chain the l2norm+gain VJP for (dq, dq_scale) / (dk, dk_scale)."""
    q, k, v, q_scale, k_scale, o, lse = residuals
    qn, vjp_q = jax.vjp(_xla_l2norm_scale, q, q_scale)
    kn, vjp_k = jax.vjp(_xla_l2norm_scale, k, k_scale)
    dqn, dkn, dv = _flash_rows_backward_impl(
        qn, kn, v, g, lse, _delta(g, o), scale, interpret=_INTERPRET)
    dq, dqs = vjp_q(dqn)
    dk, dks = vjp_k(dkn)
    return dq, dk, dv, dqs, dks


_flash_cosine_mqa_rows_cv.defvjp(_cos_rows_fwd, _cos_rows_bwd)


def flash_cosine_mqa_rows(q, k, v, q_scale, k_scale, scale):
    """Fused cosine-sim flash rows attention: raw q/k + learned per-dim gains; the
    l2norm+gain prologue runs inside the kernel.

    shard_map'd over the batch axis under an active kernel mesh (see
    flash_mqa_rows); the replicated gains' gradients are psum'd across the
    axis by shard_map's transpose rule."""
    from imagen_tpu.parallel.kernel_sharding import shard_over_batch
    return shard_over_batch(
        lambda q, k, v, qs, ks: _flash_cosine_mqa_rows_cv(q, k, v, qs, ks, scale),
        (q, k, v, q_scale, k_scale), (True, True, True, False, False))


def flash_multiquery_attention(q, k, v, scale):
    """Flash multi-query attention over pre-normalized q/k: q (b,h,n,d), k/v (b,nk,d)."""
    b, h, n, d = q.shape
    return flash_mqa_rows(q.reshape(b, h * n, d), k, v, scale).reshape(b, h, n, d)


def flash_cosine_mqa(q, k, v, q_scale, k_scale, scale):
    """Fused cosine-sim flash attention, (b, h, n, d) layout."""
    b, h, n, d = q.shape
    out = flash_cosine_mqa_rows(q.reshape(b, h * n, d), k, v,
                                q_scale, k_scale, scale)
    return out.reshape(b, h, n, d)


def _flash_mqa_forward(q, k, v, scale, block_q=None, block_k=512, interpret=False,
                       q_scale=None, k_scale=None, return_stats=False,
                       _force_tier=None):
    """(b, h, n, d)-layout forward wrapper (tests / direct kernel exercise)."""
    b, h, n, d = q.shape
    out = _flash_rows_forward(q.reshape(b, h * n, d), k, v, scale,
                              block_q=block_q, block_k=block_k,
                              interpret=interpret, q_scale=q_scale,
                              k_scale=k_scale, return_stats=return_stats,
                              _force_tier=_force_tier)
    if return_stats:
        o, lse = out
        return o.reshape(b, h, n, d), lse.reshape(b, h, n)
    return out.reshape(b, h, n, d)


def flash_attention_available(q_len, dim_head, has_mask, has_bias, heads=1):
    """Heuristic gate for routing through the flash kernel. `heads` lets the gate
    check divisibility on the actual row count R = q_len*heads (the rows layout
    makes e.g. 40x40=1600-token fmaps tileable at h=8 where q_len alone is not)."""
    import os
    if os.environ.get('IMAGEN_TPU_DISABLE_PALLAS'):
        # trace-time kill switch: bench.py lowers the XLA-only path once to get
        # true model FLOPs (XLA cost analysis cannot see inside pallas calls)
        return False
    if has_mask or has_bias:
        return False
    if q_len < FLASH_MIN_SEQ:
        return False
    if dim_head > 128:
        return False
    if _pick_block_q(q_len * heads) is None:
        # no aligned row-block tiles the row axis: fall back to the XLA path
        # instead of crashing at trace time
        return False
    return jax.default_backend() == 'tpu'


# --- grouped temporal attention, packed I/O (video fast path) -------------------------
#
# Video temporal attention is MQA over frames*heads rows PER PIXEL with a tiny
# KV (frames+null). Each pixel alone is far too small a program, so G pixels
# batch into one: their rows/keys concatenate (free reshapes of the contiguous
# layouts) and a block-diagonal additive bias tile kills the cross-pixel terms.
# The kernel consumes the PACKED (G*frames, heads*d) q block directly and
# lane-slices each head inside (Mosaic handles static lane slices exactly) —
# no (b, n, h*d) -> rows retile ever touches HBM. Backward falls back to the
# XLA recompute (the forward is the sampling hot path; training is unchanged).

def _grouped_packed_kernel(q_ref, k_ref, v_ref, qs_ref, bias_ref, o_ref, *,
                           heads, d):
    kblk = k_ref[0]                                   # (nkp, d), pre-normalized
    vblk = v_ref[0]
    rows = q_ref.shape[1]                             # G * frames
    gain = qs_ref[0].astype(jnp.float32)              # scale*log2e prefolded
    for hh in range(heads):
        qh = _l2norm_scale(q_ref[0][:, hh * d:(hh + 1) * d], gain)
        s = jax.lax.dot_general(
            qh, kblk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)       # (rows, nkp), base-2
        s = s + bias_ref[0, pl.ds(hh * rows, rows), :]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        acc = jax.lax.dot_general(
            p.astype(vblk.dtype), vblk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0, :, hh * d:(hh + 1) * d] = (acc / l).astype(o_ref.dtype)


def _grouped_packed_forward(q, k, v, q_scale, k_scale, bias_e, scale, heads,
                            interpret=False):
    """q: (B, rows, heads*d) packed; k/v: (B, nk, d); bias_e: (heads*rows, nk)
    fp32 natural-domain additive bias (-1e30 masks)."""
    B, rows, hd = q.shape
    d = hd // heads
    nk = k.shape[1]
    nkp = _round_up(nk, 128)

    k = _xla_l2norm_scale(k, k_scale)
    if nkp != nk:
        pad = ((0, 0), (0, nkp - nk), (0, 0))
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    bias2 = jnp.full((heads * rows, nkp), _NEG_INF, jnp.float32)
    bias2 = bias2.at[:, :nk].set(bias_e.astype(jnp.float32) * _LOG2E)

    return pl.pallas_call(
        functools.partial(_grouped_packed_kernel, heads=heads, d=d),
        out_shape=jax.ShapeDtypeStruct((B, rows, hd), q.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, rows, hd), lambda bb: (bb, 0, 0)),
            pl.BlockSpec((1, nkp, d), lambda bb: (bb, 0, 0)),
            pl.BlockSpec((1, nkp, d), lambda bb: (bb, 0, 0)),
            pl.BlockSpec((1, d), lambda bb: (0, 0)),
            pl.BlockSpec((1, heads * rows, nkp), lambda bb: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, rows, hd), lambda bb: (bb, 0, 0)),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=('parallel',)),
    )(q, k, v, (q_scale * (scale * _LOG2E)).reshape(1, d), bias2[None])


def _grouped_packed_naive(q, k, v, q_scale, k_scale, bias_e, scale, heads):
    """XLA reference semantics for the packed grouped kernel."""
    B, rows, hd = q.shape
    d = hd // heads
    nk = k.shape[1]
    q4 = q.reshape(B, rows, heads, d)
    qn = _xla_l2norm_scale(q4, q_scale)
    kn = _xla_l2norm_scale(k, k_scale)
    sim = jnp.einsum('brhd,bjd->bhrj', qn, kn).astype(jnp.float32) * scale
    sim = sim + bias_e.reshape(heads, rows, nk)[None]
    attn = jax.nn.softmax(sim, axis=-1).astype(q.dtype)
    out = jnp.einsum('bhrj,bjd->brhd', attn, v)
    return out.reshape(B, rows, hd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _flash_grouped_cosine_cv(q, k, v, q_scale, k_scale, bias_e, scale, heads):
    return _grouped_packed_forward(q, k, v, q_scale, k_scale, bias_e, scale,
                                   heads, interpret=_INTERPRET)


def _grouped_fwd(q, k, v, q_scale, k_scale, bias_e, scale, heads):
    out = _grouped_packed_forward(q, k, v, q_scale, k_scale, bias_e, scale,
                                  heads, interpret=_INTERPRET)
    return out, (q, k, v, q_scale, k_scale, bias_e)


def _grouped_bwd(scale, heads, residuals, g):
    q, k, v, q_scale, k_scale, bias_e = residuals
    _, vjp = jax.vjp(
        lambda *a: _grouped_packed_naive(*a, scale, heads), q, k, v, q_scale,
        k_scale, bias_e)
    return vjp(g)


_flash_grouped_cosine_cv.defvjp(_grouped_fwd, _grouped_bwd)


def flash_grouped_cosine(q, k, v, q_scale, k_scale, bias_e, scale, heads):
    """Grouped packed temporal attention (see module section comment).

    q (B, rows, heads*d); k/v (B, nk, d); bias_e (heads*rows, nk) fp32 additive
    bias in the natural domain (use -1e30 to mask, NOT -inf). The leading dim
    B packs (video_batch, pixel_groups) batch-major, so under an active kernel
    mesh the call shard_maps over it (see flash_mqa_rows); the shared bias and
    gains stay replicated."""
    from imagen_tpu.parallel.kernel_sharding import shard_over_batch
    return shard_over_batch(
        lambda q, k, v, qs, ks, be: _flash_grouped_cosine_cv(
            q, k, v, qs, ks, be, scale, heads),
        (q, k, v, q_scale, k_scale, bias_e),
        (True, True, True, False, False, False))


def grouped_temporal_available(batch, frames, heads, nk_local, interpret=False):
    """Gate for the grouped temporal path: pick the pixel group size G (None if
    the shapes don't tile). Targets ~128-row per-head tiles (MXU-full M) with
    the whole (heads*G*frames, nk_pad) bias resident in VMEM."""
    import os
    if os.environ.get('IMAGEN_TPU_DISABLE_PALLAS'):
        return None
    if not (interpret or jax.default_backend() == 'tpu'):
        return None
    G = max(1, 128 // max(frames, 1))
    while G > 1 and (batch % G or _round_up(G * nk_local, 128) > _ONESHOT_MAX_NK):
        G //= 2
    if batch % G or _round_up(G * nk_local, 128) > _ONESHOT_MAX_NK:
        return None  # keys too long even ungrouped (e.g. flattened spatial attn)
    rows = G * frames
    if rows % 8 or rows > 1024:
        return None
    if heads * rows * _round_up(G * nk_local, 128) * 4 > 4 * 1024 * 1024:
        return None  # bias tile would crowd VMEM
    return G


# --- rows-packed temporal attention (per-pixel KV in ONE lane tile) -------------------
#
# Second-generation temporal kernel. The grouped kernel above concatenates
# G=8 pixels' keys (136 -> 256 lane pad) and unrolls 8 per-head matmuls per
# program, so only ~7% of its sim/softmax area is live. This variant uses two
# facts instead:
#   1. (rows, h*d) reshapes FREELY to (rows*h, d) (row-major: h is already the
#      next-minor axis), so all heads pack into the matmul M dimension with
#      row order (pixel, frame, head) — ONE (G*F*H, d) x (d, 128) matmul per
#      program replaces the unrolled head loop.
#   2. G is chosen so ALL G pixels' keys fit ONE 128-lane tile
#      (G*nk_local <= 128), halving the padded sim/softmax area vs the
#      grouped kernel's 256 lanes.
# The bias tile stays block-diagonal (rows of pixel g live against key slice
# [g*nk, (g+1)*nk)) and is resident across the grid.

def _temporal_rows_kernel(q_ref, k_ref, v_ref, qs_ref, bias_ref, o_ref, *,
                          ng, m, nkp):
    """ng pixel-groups per program (the per-group programs are too small to
    amortize grid overhead — measured); the (m, nkp) bias tile is IDENTICAL
    for every group, so one resident copy serves all ng iterations."""
    gain = qs_ref[0].astype(jnp.float32)              # scale*log2e prefolded
    bias = bias_ref[0]
    for i in range(ng):
        kblk = k_ref[0, i * nkp:(i + 1) * nkp]        # (nkp, d), pre-normalized
        qn = _l2norm_scale(q_ref[0, i * m:(i + 1) * m], gain)
        s = jax.lax.dot_general(
            qn, kblk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)       # (m, nkp), base-2 domain
        s = s + bias
        mx = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - mx)
        l = jnp.sum(p, axis=-1, keepdims=True)
        acc = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, i * nkp:(i + 1) * nkp],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0, i * m:(i + 1) * m] = (acc / l).astype(o_ref.dtype)


def _temporal_rows_ng(n_groups, M):
    """Pixel-groups per program: fold enough groups together to amortize the
    per-program grid overhead (~1 us measured) while keeping blocks modest."""
    import os
    forced = int(os.environ.get('IMAGEN_TPU_TEMPORAL_NG', 0))
    for ng in ((forced,) if forced else (8, 4, 2, 1)):
        if n_groups % ng == 0 and ng * M <= 8192:
            return ng
    return 1


def _temporal_rows_forward(q, k, v, q_scale, k_scale, bias_e, scale, heads,
                           interpret=False):
    """q: (B, rows, heads*d) packed (rows = G*frames); k/v: (B, nk, d) with
    nk = G*nk_local <= 128; bias_e: (rows*heads, 128) fp32 natural-domain
    additive bias in (pixel, frame, head) row order (-1e30 masks, incl. the
    pad columns beyond nk)."""
    B, rows, hd = q.shape
    d = hd // heads
    nk = k.shape[1]
    nkp = _round_up(nk, 128)
    assert bias_e.shape == (rows * heads, nkp), (bias_e.shape, rows, heads, nkp)

    k = _xla_l2norm_scale(k, k_scale)
    if nk != nkp:
        pad = ((0, 0), (0, nkp - nk), (0, 0))
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    M = rows * heads
    ng = _temporal_rows_ng(B, M)
    q_rows = q.reshape(B // ng, ng * M, d)   # free: (rows, h*d) -> (rows*h, d)
    k = k.reshape(B // ng, ng * nkp, d)
    v = v.reshape(B // ng, ng * nkp, d)
    bias2 = (bias_e.astype(jnp.float32) * _LOG2E)[None]

    out = pl.pallas_call(
        functools.partial(_temporal_rows_kernel, ng=ng, m=M, nkp=nkp),
        out_shape=jax.ShapeDtypeStruct((B // ng, ng * M, d), q.dtype),
        grid=(B // ng,),
        in_specs=[
            pl.BlockSpec((1, ng * M, d), lambda bb: (bb, 0, 0)),
            pl.BlockSpec((1, ng * nkp, d), lambda bb: (bb, 0, 0)),
            pl.BlockSpec((1, ng * nkp, d), lambda bb: (bb, 0, 0)),
            pl.BlockSpec((1, d), lambda bb: (0, 0)),
            pl.BlockSpec((1, M, nkp), lambda bb: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, ng * M, d), lambda bb: (bb, 0, 0)),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=('parallel',)),
    )(q_rows, k, v, (q_scale * (scale * _LOG2E)).reshape(1, d), bias2)
    return out.reshape(B, rows, hd)


def _temporal_rows_naive(q, k, v, q_scale, k_scale, bias_e, scale, heads):
    """XLA reference semantics for the rows-packed temporal kernel."""
    B, rows, hd = q.shape
    d = hd // heads
    nk = k.shape[1]
    qn = _xla_l2norm_scale(q.reshape(B, rows * heads, d), q_scale)
    kn = _xla_l2norm_scale(k, k_scale)
    sim = jnp.einsum('bmd,bjd->bmj', qn, kn).astype(jnp.float32) * scale
    sim = sim + bias_e[None, :, :nk]
    attn = jax.nn.softmax(sim, axis=-1).astype(q.dtype)
    out = jnp.einsum('bmj,bjd->bmd', attn, v)
    return out.reshape(B, rows, hd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _flash_temporal_rows_cv(q, k, v, q_scale, k_scale, bias_e, scale, heads):
    return _temporal_rows_forward(q, k, v, q_scale, k_scale, bias_e, scale,
                                  heads, interpret=_INTERPRET)


def _temporal_rows_fwd(q, k, v, q_scale, k_scale, bias_e, scale, heads):
    out = _temporal_rows_forward(q, k, v, q_scale, k_scale, bias_e, scale,
                                 heads, interpret=_INTERPRET)
    return out, (q, k, v, q_scale, k_scale, bias_e)


def _temporal_rows_bwd(scale, heads, residuals, g):
    q, k, v, q_scale, k_scale, bias_e = residuals
    _, vjp = jax.vjp(
        lambda *a: _temporal_rows_naive(*a, scale, heads), q, k, v, q_scale,
        k_scale, bias_e)
    return vjp(g)


_flash_temporal_rows_cv.defvjp(_temporal_rows_fwd, _temporal_rows_bwd)


def flash_temporal_rows(q, k, v, q_scale, k_scale, bias_e, scale, heads):
    """Rows-packed per-pixel-KV temporal attention (see section comment).

    q (B, rows, heads*d); k/v (B, nk<=128, d); bias_e (rows*heads, 128) fp32
    natural-domain additive bias, (pixel, frame, head) row order, -1e30 masks
    (cross-pixel, causal, AND the pad columns beyond nk). shard_map'd over the
    leading (batch-major) dim under an active kernel mesh (see
    flash_mqa_rows)."""
    from imagen_tpu.parallel.kernel_sharding import shard_over_batch
    return shard_over_batch(
        lambda q, k, v, qs, ks, be: _flash_temporal_rows_cv(
            q, k, v, qs, ks, be, scale, heads),
        (q, k, v, q_scale, k_scale, bias_e),
        (True, True, True, False, False, False))


def temporal_rows_available(batch, frames, heads, nk_local, interpret=False):
    """Gate for the rows-packed temporal path: pick the pixel group size G
    (None if the shapes don't fit). All G pixels' keys share one lane tile and
    the (G*frames*heads, nkp) sim tile must stay VMEM-friendly.

    OPT-IN (`IMAGEN_TPU_TEMPORAL_ROWS=1`): measured SLOWER than the grouped
    kernel at the video hot shape at every (G, ng) configuration
    (tools/microbench_temporal.py; BENCH.md kernel table) — kept as the
    documented second-generation design study, not the wired default."""
    import os
    if os.environ.get('IMAGEN_TPU_DISABLE_PALLAS'):
        return None
    if not os.environ.get('IMAGEN_TPU_TEMPORAL_ROWS'):
        return None
    if not (interpret or jax.default_backend() == 'tpu'):
        return None
    if nk_local > 128:
        return None
    forced = int(os.environ.get('IMAGEN_TPU_TEMPORAL_G', 0))
    G = forced or max(1, 128 // max(nk_local, 1))
    while G > 1 and batch % G:
        G -= 1
    if batch % G:
        return None
    M = G * frames * heads
    nkp = _round_up(G * nk_local, 128)
    if M % 8 or M > 4096 or nkp > 512:
        return None  # sublane alignment; sim+bias tiles <= ~4 MB VMEM
    if M * nkp * 8 > 4 * 1024 * 1024:
        return None  # resident bias + sim tile budget
    return G


def build_rows_bias(bias_hfj, causal_mask, G):
    """Block-diagonal additive bias tile for `flash_temporal_rows`.

    bias_hfj: (heads, f, nk_local) fp32 per-pixel additive bias (natural
    domain). causal_mask: (f, nk_local) bool, True = masked, or None.
    Returns (G*f*heads, 128) fp32 with -1e30 on cross-pixel, masked, and pad
    terms; row order (pixel-in-group, frame, head) matches the free
    (rows, h*d) -> (rows*h, d) reshape the kernel consumes.
    """
    h, f, nkl = bias_hfj.shape
    blk = bias_hfj
    if causal_mask is not None:
        blk = jnp.where(causal_mask[None], _NEG_INF, blk)
    blk_fh = blk.transpose(1, 0, 2)                    # (f, h, nkl)
    eye = jnp.eye(G, dtype=bool)[:, None, None, :, None]
    tile = jnp.where(eye, blk_fh[None, :, :, None, :], _NEG_INF)
    tile = tile.reshape(G * f * h, G * nkl)
    nkp = _round_up(G * nkl, 128)
    if G * nkl != nkp:
        tile = jnp.pad(tile, ((0, 0), (0, nkp - G * nkl)),
                       constant_values=_NEG_INF)
    return tile


def build_grouped_bias(bias_hfj, causal_mask, G):
    """Block-diagonal additive bias tile for `flash_grouped_cosine`.

    bias_hfj: (heads, f, nk_local) fp32 per-pixel additive bias (natural domain).
    causal_mask: (f, nk_local) bool, True = masked, or None.
    Returns (heads*G*f, G*nk_local) fp32 with -1e30 on cross-pixel and masked
    terms; row order (head, pixel-in-group, frame) matches the packed kernel.
    """
    h, f, nkl = bias_hfj.shape
    blk = bias_hfj
    if causal_mask is not None:
        blk = jnp.where(causal_mask[None], _NEG_INF, blk)
    eye = jnp.eye(G, dtype=bool)[None, :, None, :, None]
    tile = jnp.where(eye, blk[:, None, :, None, :], _NEG_INF)
    return tile.reshape(h * G * f, G * nkl)
