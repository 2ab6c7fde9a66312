"""From-disk input-path throughput at the headline config (VERDICT r3
missing #5): materialized multi-hot day files on disk -> mmap read ->
padded HostBatch -> U-layout build (native) -> flat per-hit device arrays.

The sustained bench (bench.py) builds host batches from in-memory index
pools; this probe measures the REAL input pipeline the reference needed
its NVIDIA loader for (data_loader_terabyte.py:23-171): bytes come off
the filesystem through the same loader a real training run uses
(data/multi_hot_criteo.py::MultiHotCriteoDataset — the zero-copy mmap
npy layout).

Reports examples/s for each host stage and the whole pipeline, to compare
against the device step rate (191k ex/s/chip ragged headline, r3): the
input path keeps up iff pipeline ex/s > device ex/s, since
HostPrefetcher overlaps the two.

Usage: PYTHONPATH=/root/repo python bench_scripts/disk_input_probe.py
       [--batches N] [--workdir DIR] [--device]
(CPU-only by default: the H2D leg is excluded like the headline bench —
the axon tunnel's 39 MB/s device_put is an environment artifact; pass
--device to include it anyway.)
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V2_HOT_SIZES = (3, 2, 1, 2, 6, 1, 1, 1, 1, 7, 3, 8, 1, 6, 9, 5, 1, 1, 1,
                12, 100, 27, 10, 3, 1, 1)
BATCH = 16384
TABLE_ROWS = 200_000


def generate_days(workdir: str, batches: int, days: int = 2) -> str:
    """Write the materialized multi-hot on-disk layout directly (the
    format contract of data/multi_hot_criteo.py:11-20)."""
    os.makedirs(workdir, exist_ok=True)
    meta = os.path.join(workdir, "meta.json")
    total_hot = int(np.sum(V2_HOT_SIZES))
    rows_per_day = (batches * BATCH + days - 1) // days
    if os.path.exists(meta):
        return workdir
    rng = np.random.default_rng(0)
    for d in range(days):
        dense = rng.random((rows_per_day, 13), np.float32)
        labels = (rng.random((rows_per_day, 1)) < 0.3).astype(np.float32)
        sparse = rng.integers(
            0, TABLE_ROWS, (rows_per_day, total_hot), dtype=np.int64
        ).astype(np.int32)
        np.save(os.path.join(workdir, f"day_{d}_dense.npy"), dense)
        np.save(os.path.join(workdir, f"day_{d}_labels.npy"), labels)
        np.save(os.path.join(workdir, f"day_{d}_sparse.npy"), sparse)
    with open(meta, "w") as f:
        json.dump(
            {
                "hot_sizes": list(V2_HOT_SIZES),
                "table_sizes": [TABLE_ROWS] * 26,
                "days": days,
            },
            f,
        )
    return workdir


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=int, default=24)
    p.add_argument("--workdir", default="/tmp/dlrm_disk_probe")
    p.add_argument("--device", action="store_true",
                   help="include the H2D transfer (tunnel-limited here)")
    args = p.parse_args()

    from dlrm_tpu.config import DLRMConfig
    from dlrm_tpu.data.multi_hot_criteo import MultiHotCriteoDataset
    from dlrm_tpu.models.dlrm import DLRMModel
    from dlrm_tpu.train.stream_step import plan_for_model

    generate_days(args.workdir, args.batches)
    gb = sum(
        os.path.getsize(os.path.join(args.workdir, f))
        for f in os.listdir(args.workdir)
    ) / 2**30
    print(f"dataset: {gb:.2f} GiB on disk at {args.workdir}", flush=True)

    cfg = DLRMConfig(
        embedding_dim=128,
        table_sizes=(TABLE_ROWS,) * 26,
        mlp_bot=(13, 512, 256, 128),
        mlp_top=(1024, 1024, 512, 256, 1),
        interaction="dot",
        loss="bce",
        num_indices_per_lookup=max(V2_HOT_SIZES),
        compute_dtype="bfloat16",
    )
    model = DLRMModel(cfg)
    plan = plan_for_model(model, BATCH, block_rows=2048,
                          hot_sizes=V2_HOT_SIZES)

    ds = MultiHotCriteoDataset(args.workdir, BATCH, drop_last=True)
    n = min(args.batches, len(ds))

    # streaming measurement (one batch in flight — materializing all n
    # padded HostBatches would be ~350 MB each and swap the host)
    t_read = t_work = t_ship = 0.0
    if args.device:
        import jax
    for i in range(n):
        t0 = time.perf_counter()
        # flat=True: the on-disk row-major [B, 214] sparse block feeds the
        # builder and the flat device layout directly — no [26, B, 100]
        # padding expansion (340 MB of writes/batch on the padded path)
        hb = ds.read_batch(i, flat=True)
        t_read += time.perf_counter() - t0
        t0 = time.perf_counter()
        hb = hb.with_stream_work(plan, unit_weights=True,
                                 update_touched_only=True)
        t_work += time.perf_counter() - t0
        if args.device:
            t0 = time.perf_counter()
            dev = hb.to_device(flat_hots=plan.hot)
            jax.block_until_ready(dev.idx)
            t_ship += time.perf_counter() - t0
    if not args.device:
        t_ship = None

    ex = n * BATCH
    print(f"read_batch (disk->HostBatch): {ex / t_read:,.0f} ex/s "
          f"({t_read / n * 1e3:.1f} ms/batch)")
    print(f"U-layout build:               {ex / t_work:,.0f} ex/s "
          f"({t_work / n * 1e3:.1f} ms/batch)")
    total = t_read + t_work + (t_ship or 0.0)
    if t_ship is not None:
        print(f"H2D (flat per-hit):           {ex / t_ship:,.0f} ex/s "
              f"({t_ship / n * 1e3:.1f} ms/batch)")
    print(f"PIPELINE (serial stages):     {ex / total:,.0f} ex/s — "
          f"{'KEEPS UP with' if ex / total > 191_382 else 'BELOW'} the "
          "191,382 ex/s/chip r3 device headline", flush=True)


if __name__ == "__main__":
    main()
