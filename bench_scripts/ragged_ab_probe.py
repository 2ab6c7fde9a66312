"""A/B the r3->r4 ragged-headline regression (VERDICT r4 next-round #2).

BENCH_r03 ragged = 191,382 ex/s/chip; BENCH_r04 = 185,777 (-2.9%) on the
same metric. Round 4 touched the measured path in two ways:
  (a) touched-only K2 worklists (stream_plan.touched_update_items) --
      bench.py passes update_touched_only=True on every leg;
  (b) the K2 kernels' first-write predicate changed from `blk > 0` to
      `blk != ib_ref[0]` (needed for worklists that don't start at 0).

This probe runs the EXACT bench.py ragged measurement in fresh processes,
interleaved A/B/A/B, differing only in touched_only:

    python bench_scripts/ragged_ab_probe.py [reps]

(b) is active in both legs (it's unconditional); if A==B and both are at
r4's level, (b) or machine noise is the cause; if A>B, the worklist is.
Results recorded in bench_scripts/PERF_NOTES.md.
"""

import subprocess
import sys


def run_leg(touched: bool) -> float:
    code = (
        "import bench\n"
        # from_disk=False: replicate the r3/r4 in-memory-pool conditions the
        # regression was measured under
        f"r = bench._measure(bench.V2_HOT_SIZES, flat=True, "
        f"touched_only={touched}, from_disk=False)\n"
        "r = r['rate'] if isinstance(r, dict) else r\n"
        "print(f'RESULT {r:.1f}')\n"
    )
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=900, cwd="/root/repo",
    )
    for line in r.stdout.splitlines():
        if line.startswith("RESULT "):
            return float(line.split()[1])
    raise RuntimeError(
        f"leg touched={touched} failed:\n{r.stdout[-500:]}\n{r.stderr[-2000:]}"
    )


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    results = {False: [], True: []}
    for rep in range(reps):
        for touched in (False, True):
            rate = run_leg(touched)
            results[touched].append(rate)
            print(
                f"rep {rep} touched_only={touched}: {rate:,.0f} ex/s/chip",
                flush=True,
            )
    for touched, rates in results.items():
        print(
            f"touched_only={touched}: best {max(rates):,.0f} "
            f"mean {sum(rates)/len(rates):,.0f} over {rates}"
        )


if __name__ == "__main__":
    main()
