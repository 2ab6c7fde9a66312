"""A/B for the r2->r3 uniform-H8 sustained regression (VERDICT r3 weak #1)
and the touched-only K2 worklist at the headline shapes.

r2's bench measured uniform-H8 alone with the PADDED device layout:
201,948 ex/s/chip (BENCH_r02.json). r3 measured ragged + uniform in one
run with the FLAT per-hit layout: uniform 197,689 (-2.1%). This probe
isolates the variables on one quiet run, reusing bench.py's exact
measurement loop (same staged batches, same in-window host builds):

  uniform-H8  x {padded, flat} x {full revolve, touched-only}
  ragged v2   x {flat}         x {full revolve, touched-only}

Usage: PYTHONPATH=/root/repo python bench_scripts/uniform_ab_probe.py
(real chip; ~5 compiles of ~60-120 s each through the tunnel — run in
background with a generous timeout)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (the repo-root bench module)


def run(tag, hot_sizes, flat, touched):
    rate = bench._measure(hot_sizes, flat=flat, touched_only=touched)
    print(f"{tag:44s}: {rate:,.0f} ex/s/chip "
          f"({bench.BATCH / rate * 1e3:.2f} ms/step)", flush=True)
    return rate


def main():
    bench._wait_for_device()
    run("uniform-H8 padded  full-revolve (r2 path)", 8, False, False)
    run("uniform-H8 flat    full-revolve (r3 path)", 8, True, False)
    run("uniform-H8 flat    touched-only (r4)", 8, True, True)
    run("ragged-v2  flat    full-revolve (r3 path)",
        bench.V2_HOT_SIZES, True, False)
    run("ragged-v2  flat    touched-only (r4)",
        bench.V2_HOT_SIZES, True, True)


if __name__ == "__main__":
    main()
