"""Launcher + dataset-manifest tool tests (C21 closure).

The reference ships a torchx ddp component (aws_component.py:13-42) and
static md5 manifests for its preprocessed datasets (README.MD:83,150).
Working analogs here: scripts/launch.py spawns N rendezvous-wired trainer
processes running the REAL main() (the elastic_launch-style coverage of
torchrec_dlrm/tests/test_dlrm_main.py:44-57, but through the launcher the
user actually invokes), and scripts/dataset_manifest.py generates/verifies
md5sum-format manifests of preprocessed outputs."""

import os
import re
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LAUNCH = os.path.join(REPO, "scripts", "launch.py")
MANIFEST = os.path.join(REPO, "scripts", "dataset_manifest.py")

CLI_ARGS = [
    "--arch-embedding-size", "60-80-100",
    "--arch-sparse-feature-size", "16",
    "--arch-mlp-bot", "4-8-16",
    "--arch-mlp-top", "24-8-1",
    "--data-generation", "random",
    "--mini-batch-size", "16",
    "--num-batches", "4",
    "--sharded", "--mesh-data", "2", "--mesh-model", "2",
    "--print-freq", "2",
]


def _base_env():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["PALLAS_AXON_POOL_IPS"] = ""
    env.pop("XLA_FLAGS", None)
    env.pop("DLRM_NUM_PROCESSES", None)
    return env


def _losses(out: str):
    return [
        float(m.group(1))
        for m in re.finditer(r"loss (\d+\.\d+)", out)
    ]


def test_launcher_two_process_cli_matches_single_process():
    """launch.py --nproc 2 runs the real cli.main() across two rendezvous'd
    processes (2 virtual devices each -> global 2x2 mesh); training losses
    must match a single-process 4-device run bit-for-bit."""
    env = _base_env()
    r = subprocess.run(
        [sys.executable, LAUNCH, "--nproc", "2", "--devices-per-proc", "2",
         "-m", "dlrm_tpu.cli", "--"] + CLI_ARGS,
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    mp_losses = _losses(r.stdout)
    # both ranks print the same 2 loss lines (interleaving is arbitrary):
    # every loss value must appear exactly twice
    assert len(mp_losses) == 4, r.stdout
    from collections import Counter

    assert all(c == 2 for c in Counter(mp_losses).values()), mp_losses

    env1 = _base_env()
    env1["JAX_PLATFORMS"] = "cpu"
    env1["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    r1 = subprocess.run(
        [sys.executable, "-m", "dlrm_tpu.cli"] + CLI_ARGS,
        env=env1, capture_output=True, text=True, timeout=600,
    )
    assert r1.returncode == 0, r1.stdout + r1.stderr
    sp_losses = _losses(r1.stdout)
    assert len(sp_losses) == 2
    np.testing.assert_array_equal(sorted(set(mp_losses)), sorted(sp_losses))


def test_launcher_print_cmds_and_host_constraint():
    env = _base_env()
    r = subprocess.run(
        [sys.executable, LAUNCH, "--nproc", "4", "--nproc-per-host", "2",
         "--coordinator", "host0:1234", "--print-cmds", "-m",
         "dlrm_tpu.v2_main", "--", "--sharded"],
        env=env, capture_output=True, text=True, timeout=60,
    )
    assert r.returncode == 0, r.stderr
    lines = [ln for ln in r.stdout.splitlines() if ln.startswith("host ")]
    assert len(lines) == 4
    assert lines[0].startswith("host 0 rank 0: DLRM_COORDINATOR=host0:1234")
    assert "DLRM_NUM_PROCESSES=4" in lines[3]
    assert "DLRM_PROCESS_ID=3" in lines[3]
    assert lines[3].startswith("host 1")  # ranks 2,3 on host 1

    # aws_component.py:25-29: multi-host totals must be a multiple of the
    # per-host process count
    r2 = subprocess.run(
        [sys.executable, LAUNCH, "--nproc", "3", "--nproc-per-host", "2",
         "--print-cmds"],
        env=env, capture_output=True, text=True, timeout=60,
    )
    assert r2.returncode != 0
    assert "multiple of" in r2.stderr


def test_dataset_manifest_roundtrip(tmp_path):
    d = tmp_path / "proc"
    d.mkdir()
    rng = np.random.default_rng(0)
    np.save(d / "day_0.npy", rng.integers(0, 255, 100, dtype=np.uint8))
    (d / "train_data.bin").write_bytes(rng.bytes(512))
    (d / "notes.txt").write_text("not hashed")
    env = _base_env()

    r = subprocess.run(
        [sys.executable, MANIFEST, "generate", str(d)],
        env=env, capture_output=True, text=True, timeout=60,
    )
    assert r.returncode == 0, r.stderr
    manifest = (d / "md5sums.txt").read_text().splitlines()
    # md5sum(1) format, like the reference's shipped files; txt excluded
    assert len(manifest) == 2
    assert all(re.match(r"^[0-9a-f]{32}  \S+$", ln) for ln in manifest)

    r = subprocess.run(
        [sys.executable, MANIFEST, "verify", str(d)],
        env=env, capture_output=True, text=True, timeout=60,
    )
    assert r.returncode == 0 and "OK: 2 entries" in r.stdout

    # corruption must be caught
    (d / "train_data.bin").write_bytes(rng.bytes(512))
    r = subprocess.run(
        [sys.executable, MANIFEST, "verify", str(d)],
        env=env, capture_output=True, text=True, timeout=60,
    )
    assert r.returncode == 1
    assert "MISMATCH train_data.bin" in r.stdout
