"""Regenerate (or verify) the committed multichip-dryrun compilation cache.

The driver validates the multi-chip path by calling
`__graft_entry__.dryrun_multichip(8)` from a FRESH checkout with a hard
timeout; the cold 8-way SPMD compile of the checked programs takes
~384 s on the 1-core driver host (LLVM -O0) — over the timeout. The dryrun
child therefore reads its persistent XLA compilation cache from the committed
directory `tools/dryrun_xla_cache/`, and this script rebuilds that
directory so a fresh checkout compiles warm (trace + cache-lookup only,
~2 min total).

Run me (and commit the result) after ANY change that alters the traced
trainer/model programs — the cache key is the serialized HLO, so a stale
cache silently degrades to the cold path; it never produces wrong results.

Usage: python tools/refresh_dryrun_cache.py [--check]
  --check: don't rebuild; fail if the current programs miss the cache or the
           environment (jax/jaxlib version) no longer matches the committed
           manifest (run by tests/test_parallel.py::test_dryrun_cache_fresh
           to catch a stale committed cache before the driver does).

Both modes run the dryrun via `_reexec_virtual_dryrun` — the SAME child
process + XLA flags + cache-dir config the driver path uses — regardless of
how many devices this host exposes, so the cache this script writes/verifies
is exactly the one the driver will read.
"""
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(REPO, 'tools', 'dryrun_xla_cache')
MANIFEST = os.path.join(REPO, 'tools', 'dryrun_cache_manifest.json')


def environment_manifest():
    """The cache is only valid for the exact jax/jaxlib that built it (the
    version is part of XLA's persistent-cache key): record it so --check and
    the test suite can detect a driver-image upgrade instead of silently
    degrading to the ~310 s cold compile."""
    import jax
    import jaxlib
    return {'jax': jax.__version__, 'jaxlib': jaxlib.__version__}


def _run_dryrun():
    sys.path.insert(0, REPO)
    import __graft_entry__ as g

    t0 = time.time()
    # unconditional re-exec: on a host exposing >=8 devices an in-process
    # dryrun would compile for THAT backend without the committed cache dir
    # configured — verifying/rebuilding nothing the driver actually uses
    g._reexec_virtual_dryrun(8)
    return time.time() - t0


def check() -> int:
    if not os.path.isdir(CACHE) or not os.listdir(CACHE):
        print('STALE CACHE: tools/dryrun_xla_cache/ is missing or empty — '
              'run `python tools/refresh_dryrun_cache.py` and commit it.',
              file=sys.stderr)
        return 1
    if os.path.exists(MANIFEST):
        with open(MANIFEST) as f:
            committed = json.load(f)
        current = environment_manifest()
        if committed != current:
            print(f'STALE CACHE: built under {committed}, running under '
                  f'{current} — the XLA cache key includes the jax version, '
                  'so every lookup will miss. Rebuild and commit.',
                  file=sys.stderr)
            return 1
    before = set(os.listdir(CACHE))
    dt = _run_dryrun()
    new = sorted(set(os.listdir(CACHE)) - before)
    print(f'dryrun completed in {dt:.1f}s; {len(new)} new cache entries')
    if new:
        print('STALE CACHE: the committed dryrun cache missed the current '
              'programs — run `python tools/refresh_dryrun_cache.py` and '
              'commit tools/dryrun_xla_cache/.', file=sys.stderr)
        return 1
    return 0


def rebuild() -> int:
    # rebuild off to the side and swap in on success: if the ~5-min dryrun
    # fails or is interrupted, the old working cache is restored, not lost
    backup = CACHE + '.bak'
    shutil.rmtree(backup, ignore_errors=True)
    if os.path.isdir(CACHE):
        os.rename(CACHE, backup)
    os.makedirs(CACHE, exist_ok=True)
    try:
        dt = _run_dryrun()
        entries = os.listdir(CACHE)
        if not entries:
            raise RuntimeError(
                'dryrun produced ZERO cache entries — the child did not '
                'compile into the committed cache dir (wrong cache config?)')
    except BaseException:
        shutil.rmtree(CACHE, ignore_errors=True)
        if os.path.isdir(backup):
            os.rename(backup, CACHE)
            print('rebuild failed; previous cache restored', file=sys.stderr)
        raise
    shutil.rmtree(backup, ignore_errors=True)
    with open(MANIFEST, 'w') as f:
        json.dump(environment_manifest(), f, indent=1)
    print(f'dryrun completed in {dt:.1f}s; cache rebuilt with '
          f'{len(entries)} entries; manifest written — commit '
          f'tools/dryrun_xla_cache/ and tools/dryrun_cache_manifest.json')
    return 0


def main() -> int:
    return check() if '--check' in sys.argv else rebuild()


if __name__ == '__main__':
    sys.exit(main())
