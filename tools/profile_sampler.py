"""Capture a jax.profiler trace of one bench-mode sampler run on the real TPU
and print the top self-time ops (parsed from the xplane via xprof).

Usage: [BENCH_MODE=base64] python tools/profile_sampler.py [trace_dir]

This is the receipt generator behind BENCH.md's "where the time goes" table
(VERDICT round 1 asked for a documented per-op profile, not just one end-to-end
number).
"""
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def capture(trace_dir):
    import bench
    imagen = bench.build_imagen()
    key = jax.random.PRNGKey(0)
    init_kwargs = dict(batch_size=1, text_len=256)
    if bench.MODE == 'video':
        init_kwargs['video_frames'] = bench.VIDEO_FRAMES
    params = imagen.init_params(key, **init_kwargs)
    text_embeds = jax.random.normal(jax.random.PRNGKey(1), (bench.BATCH, 256, 768))
    text_masks = jnp.ones((bench.BATCH, 256), bool)

    sample_kwargs = dict(text_embeds=text_embeds, text_masks=text_masks,
                         cond_scale=bench.COND_SCALE)
    if bench.MODE == 'video':
        sample_kwargs['video_frames'] = bench.VIDEO_FRAMES
    if bench.MODE in ('sr1024', 'sr1024_paper'):
        # SR-tail modes skip stage 1 and start from a given 256 image
        sample_kwargs['start_at_unet_number'] = 2
        sample_kwargs['start_image_or_video'] = jnp.clip(
            jax.random.uniform(jax.random.PRNGKey(4),
                               (bench.BATCH, 256, 256, 3)), 0., 1.)

    import numpy as np

    def run(k):
        out = imagen.sample(params, k, **sample_kwargs)
        np.asarray(out[0, 0, 0])

    run(jax.random.PRNGKey(2))   # compile
    run(jax.random.PRNGKey(3))   # warm
    with jax.profiler.trace(trace_dir):
        run(jax.random.PRNGKey(4))


def top_ops(trace_dir, n=15):
    paths = glob.glob(os.path.join(trace_dir, '**', '*.xplane.pb'),
                      recursive=True)
    if not paths:
        raise SystemExit(f'no xplane under {trace_dir}')
    path = max(paths, key=os.path.getmtime)
    from xprof.convert import raw_to_tool_data
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [path], 'framework_op_stats', {})
    if isinstance(data, bytes):
        data = data.decode()
    table = json.loads(data)
    if isinstance(table, list):
        table = table[0]
    cols = [c['id'] for c in table['cols']]
    out = []
    for row in table['rows']:
        rec = {cid: cell.get('v') for cid, cell in zip(cols, row['c'])}
        if rec.get('host_or_device') != 'Device':
            continue
        out.append({
            'op': str(rec.get('operation', ''))[:90],
            'type': rec.get('type'),
            'occurrences': rec.get('occurrences'),
            'self_us': rec.get('total_self_time'),
            'self_pct': rec.get('device_total_self_time_percent'),
            'gflops_per_s': rec.get('model_flop_rate'),
            'mem_bw_gbps': rec.get('measured_memory_bw'),
            'bound_by': rec.get('bound_by'),
        })
    out.sort(key=lambda d: -(d['self_us'] or 0))
    return cols, out[:n]


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else '/tmp/imagen_trace'
    if not os.environ.get('PROFILE_PARSE_ONLY'):
        capture(trace_dir)
    header, ops = top_ops(trace_dir)
    for o in ops:
        print(json.dumps(o))


if __name__ == '__main__':
    main()
