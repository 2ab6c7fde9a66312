"""Benchmark: DLRM training throughput on the local chip(s).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Config mirrors the reference's per-GPU benchmark shape scaled to one chip:
torchrec DLRM-v2 dot-interaction trainer (torchrec_dlrm/dlrm_main.py), 26
multi-hot sparse features, 128-dim embeddings, rowwise Adagrad fused into
the embedding backward — the config of the best published A100 number
(~148.8k examples/s/chip, torchrec_dlrm/README.MD:51-53, see BASELINE.md).

HEADLINE = the REAL MLPerf v2 multi-hot distribution (per-table hot sizes
1..100, 214 hits/sample — torchrec_dlrm's Criteo config), not the uniform
8-hot shape: VERDICT r2 weak #3 called the uniform number the less honest
one. The uniform H=8 rate is measured in the same run and reported inside
the metric text for continuity with BENCH_r01/r02.

Path under test: the streamed U-layout kernels (ops/stream_kernels.py) with
bfloat16 tables + stochastic-rounding updates, XLA gather forward/grads,
local batch 16384 — the SAME local batch as the reference's best number
(16384/GPU), the measured single-chip sweet spot (bench_scripts
train_bench sweep: 8192 -> 160k, 16384 -> 189k, 32768 -> 147k).
"""

import json
import os
import time

import numpy as np

BASELINE_EXAMPLES_PER_SEC_PER_CHIP = 148_800.0  # best 8xA100 v2 number / 8

# the real MLPerf v2 Criteo multi-hot sizes (torchrec_dlrm README/config)
V2_HOT_SIZES = (3, 2, 1, 2, 6, 1, 1, 1, 1, 7, 3, 8, 1, 6, 9, 5, 1, 1, 1,
                12, 100, 27, 10, 3, 1, 1)

BATCH = 16384
ITERS = 102  # 34 cycles over the 3 staged batch contents
WARMUP = 3
K_STAGED = 3


def _measure(hot_sizes, flat: bool = True, touched_only: bool = False) -> float:
    """Sustained examples/s/chip for one hot-size shape (uniform int or
    per-table tuple): individually dispatched steps with loop-carried
    params, and in every dispatch gap the host builds a fresh batch's
    U-layout with the native builder (native/stream_work.cc) — the
    producer-side work DevicePrefetcher overlaps with device compute.
    Completion is forced by fetching the last step's scalar loss, which
    transitively depends on every step."""
    import jax
    import jax.numpy as jnp

    from dlrm_tpu.config import DLRMConfig
    from dlrm_tpu.data.random_data import (
        fixed_multihot_batch,
        ragged_multihot_batch,
    )
    from dlrm_tpu.models.dlrm import DLRMModel
    from dlrm_tpu.ops.stream_plan import build_stream_work
    from dlrm_tpu.train.stream_step import (
        cast_emb,
        init_stream_opt_state,
        make_stream_train_step,
        pad_params,
        plan_for_model,
    )

    ragged = isinstance(hot_sizes, tuple)
    hmax = max(hot_sizes) if ragged else hot_sizes
    cfg = DLRMConfig(
        embedding_dim=128,
        # 26 Criteo-like tables; sizes capped so tables + optimizer state fit
        # single-chip HBM (scaling beyond HBM is the multi-chip path)
        table_sizes=tuple([200_000] * 26),
        mlp_bot=(13, 512, 256, 128),
        mlp_top=(1024, 1024, 512, 256, 1),
        interaction="dot",
        loss="bce",
        num_indices_per_lookup=hmax,
        compute_dtype="bfloat16",
    )
    model = DLRMModel(cfg)
    plan = plan_for_model(
        model, BATCH, block_rows=int(os.environ.get("BENCH_BLOCK_ROWS", 2048)),
        hot_sizes=hot_sizes if ragged else None,
    )
    params = cast_emb(
        pad_params(model.init_params(jax.random.PRNGKey(0)), model, plan),
        jnp.bfloat16,
    )
    opt = "rwsadagrad"
    opt_state = init_stream_opt_state(opt, params, plan)
    step = make_stream_train_step(
        model, opt, plan, fwd_impl="gather", grad_impl="gather",
        mm_dtype=jnp.bfloat16, stochastic_round=True,
    )

    # K distinct device-resident batches (the tunnel in this environment
    # caps H2D at ~39 MB/s — a pure artifact; a co-located host moves the
    # ~45 MB/step over PCIe DMA in ~2 ms — so batches are staged up
    # front and the loop cycles them; see bench_scripts/PERF_NOTES.md).
    # unit_weights: wts_u is never built or shipped — the step derives it
    # on device from rows_u != -1 (25% fewer staged bytes, 1/3 less host
    # build work).
    staged = []
    for i in range(K_STAGED):
        rng_i = np.random.default_rng(100 + i)
        hb = (
            ragged_multihot_batch(
                rng_i, cfg.num_dense, cfg.table_sizes, hot_sizes, BATCH
            )
            if ragged
            else fixed_multihot_batch(
                rng_i, cfg.num_dense, cfg.table_sizes, BATCH, hmax
            )
        )
        # flat per-hit idx layout: ships 214 real hits/sample instead of the
        # padded 26x100 slots (~12x fewer idx bytes on the real v2 shape).
        # The flat layout drops the padding columns, so every remaining hit
        # weighs 1.0 — wt need not ship at all (mirrors unit_weights).
        import dataclasses

        hb = dataclasses.replace(hb, wt=None)
        staged.append(
            hb.with_stream_work(
                plan, unit_weights=True, update_touched_only=touched_only
            ).to_device(flat_hots=plan.hot if flat else None)
        )

    # Host-side index pool: a sliding window gives each dispatch-gap build
    # distinct content without paying rng in the loop. Only each table's
    # REAL hot columns are written (the native builder reads plan.hot[t]
    # columns; the padding columns never exist on the host side).
    rng = np.random.default_rng(0)
    hots = hot_sizes if ragged else (hmax,) * len(cfg.table_sizes)
    pool = [
        rng.integers(0, n, (BATCH * h + 4096,), dtype=np.int64).astype(
            np.int32
        )
        for n, h in zip(cfg.table_sizes, hots)
    ]
    idx_buf = np.zeros((len(cfg.table_sizes), BATCH, hmax), np.int32)

    from dlrm_tpu.ops.stream_plan import touched_update_items

    def host_build(i):
        off = (i * 61) % 4096
        for t, h in enumerate(hots):
            idx_buf[t, :, :h] = pool[t][off : off + BATCH * h].reshape(
                BATCH, h
            )
        w = build_stream_work(plan, idx_buf, None, skip_wts=True)
        return touched_update_items(plan, w) if touched_only else w

    lr = 0.01
    p, s = params, opt_state
    loss = None
    for i in range(WARMUP):  # compile + pipeline warm
        p, s, loss, _ = step(p, s, staged[i % K_STAGED], lr)
        host_build(i)
    float(loss)
    t0 = time.perf_counter()
    for i in range(ITERS):
        p, s, loss, _ = step(p, s, staged[i % K_STAGED], lr)
        host_build(i)  # overlapped with the in-flight device steps
    last = float(loss)
    dt = time.perf_counter() - t0
    assert np.isfinite(last), f"non-finite loss {last}"
    return BATCH * ITERS / dt


def _wait_for_device(attempts: int = 3, probe_timeout: int = 300) -> None:
    """The TPU here sits behind a tunnel that can be transiently
    unavailable (observed: backend init hangs for minutes, then
    RuntimeError). Probe it in a SUBPROCESS (a failed in-process init is
    cached by jax for the process lifetime) with a timeout, retrying a
    few times, so a flaky minute doesn't cost the whole benchmark. If
    the probe never succeeds, proceed anyway and let the real error
    surface."""
    import subprocess
    import sys

    for i in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; jax.devices(); print('ok')"],
                timeout=probe_timeout, capture_output=True, text=True,
            )
            if r.returncode == 0 and "ok" in r.stdout:
                return
        except subprocess.TimeoutExpired:
            pass
        if i + 1 < attempts:
            print(f"# device probe {i + 1}/{attempts} failed; retrying",
                  flush=True)
            time.sleep(60)
        else:
            print(f"# device probe {i + 1}/{attempts} failed; proceeding",
                  flush=True)


def _measure_with_fallback(hot_sizes) -> float:
    """Layout choice per shape (uniform_ab_probe, r4, quiet machine):
    UNIFORM hot sizes ship the same bytes padded or flat, and the padded
    device layout steps ~2.3% faster (202,071 vs 197,457 ex/s at H8) —
    the whole r2->r3 uniform 'regression' was this layout switch. RAGGED
    shapes keep the flat layout: 12x fewer H2D bytes at 214 hits/sample.
    touched_only is on everywhere (neutral here — every block is hot at
    bs 16384 over 26x200k tables — and the capacity unlock elsewhere).
    If the preferred layout fails to compile/run, fall back to the other
    so the bench still reports a number."""
    flat = isinstance(hot_sizes, tuple)
    # the touched-only worklist skips hit-free blocks' rewrite items, which
    # is only exact when K2 updates in place (input_output_aliases); under
    # the DLRM_K2_NO_ALIAS A/B the output is a fresh buffer and skipped
    # blocks would come back uninitialized — same gate as v2_main.py:676
    touched = not os.environ.get("DLRM_K2_NO_ALIAS")
    try:
        return _measure(hot_sizes, flat=flat, touched_only=touched)
    except Exception as e:
        print(f"# {'flat' if flat else 'padded'}-layout measure failed "
              f"({type(e).__name__}: {str(e)[:200]}); retrying with the "
              "other layout", flush=True)
        return _measure(hot_sizes, flat=not flat, touched_only=touched)


def main():
    _wait_for_device()
    ragged_rate = _measure_with_fallback(V2_HOT_SIZES)
    uniform_rate = _measure_with_fallback(8)
    print(
        json.dumps(
            {
                "metric": (
                    "sustained_train_examples_per_sec_per_chip (DLRM-v2 "
                    "dot, 26x200k tables, d=128, bs=16384, REAL ragged "
                    "multi-hot 1..100 / 214 hits-per-sample, "
                    "rowwise-adagrad, streamed bf16 tables; 102 steps, "
                    "per-step host U-layout build in the measured window, "
                    "3 distinct device-staged batches; uniform-H8 shape "
                    f"same run: {uniform_rate:.0f} ex/s/chip = "
                    f"{uniform_rate / BASELINE_EXAMPLES_PER_SEC_PER_CHIP:.3f}x"
                    " baseline)"
                ),
                "value": round(ragged_rate, 1),
                "unit": "examples/s/chip",
                "vs_baseline": round(
                    ragged_rate / BASELINE_EXAMPLES_PER_SEC_PER_CHIP, 4
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
