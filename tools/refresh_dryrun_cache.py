"""Regenerate the committed multichip-dryrun compilation cache.

The driver validates the multi-chip path by calling
`__graft_entry__.dryrun_multichip(8)` from a FRESH checkout with a hard
timeout; the cold 8-way SPMD compile of the two checked programs takes
~384 s on the 1-core driver host (LLVM -O0) — over the timeout. The child
therefore reads its persistent XLA compilation cache from the committed
directory `tools/dryrun_xla_cache/`, and this script rebuilds that
directory so a fresh checkout compiles warm (trace + cache-lookup only,
~2 min total).

Run me (and commit the result) after ANY change that alters the traced
trainer/model programs — the cache key is the serialized HLO, so a stale
cache silently degrades to the cold path, it never produces wrong results.

Usage: python tools/refresh_dryrun_cache.py [--check]
  --check: don't rebuild; fail if the current programs miss the cache
           (used by tests to catch a stale committed cache).
"""
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(REPO, 'tools', 'dryrun_xla_cache')


def main() -> int:
    check_only = '--check' in sys.argv
    if not check_only:
        shutil.rmtree(CACHE, ignore_errors=True)
    os.makedirs(CACHE, exist_ok=True)
    before = set(os.listdir(CACHE))

    sys.path.insert(0, REPO)
    import __graft_entry__ as g

    t0 = time.time()
    g.dryrun_multichip(8)
    dt = time.time() - t0
    after = set(os.listdir(CACHE))
    new = sorted(after - before)
    print(f'dryrun completed in {dt:.1f}s; cache entries: '
          f'{len(after)} total, {len(new)} new')
    if check_only and new:
        print('STALE CACHE: the committed dryrun cache missed the current '
              'programs — run `python tools/refresh_dryrun_cache.py` and '
              'commit tools/dryrun_xla_cache/.', file=sys.stderr)
        return 1
    return 0


if __name__ == '__main__':
    sys.exit(main())
