"""Per-stage profile of any registered query: runs it and prints Ray Data's
execution stats (operator wall times, block counts, memory), the feedback
loop used to find stage-level bottlenecks (e.g. the per-group-Python
aggregate pathology fixed in functions/combine.py).

Usage: python tools/profile_query.py <query_name> [sf_dir] [--cpus N]
"""

from __future__ import annotations

import sys
import time


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if not args:
        print(__doc__)
        return 2
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"
    cpus = 8
    if "--cpus" in sys.argv:
        cpus = int(sys.argv[sys.argv.index("--cpus") + 1])

    sys.path.insert(0, ".")
    import __ray_entry__ as entrymod

    import ray
    from ray.data import DataContext, Dataset

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False,
                 logging_level="ERROR")
    DataContext.get_current().enable_progress_bars = False

    qs = entrymod.queries()
    if name not in qs:
        print(f"unknown query {name!r}; known: {sorted(qs)}")
        return 2

    t0 = time.time()
    result = qs[name](sf_dir)
    if isinstance(result, Dataset):
        result = result.materialize()
        n = result.count()
        wall = time.time() - t0
        print(f"=== {name}: {n} rows in {wall:.2f}s (sf_dir={sf_dir}, "
              f"cpus={cpus}) ===\n")
        print(result.stats())
    else:
        wall = time.time() - t0
        print(f"=== {name}: {len(result)} rows in {wall:.2f}s — result is "
              f"driver-side ({type(result).__name__}); stage stats are "
              f"printed for Dataset-returning queries ===")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
