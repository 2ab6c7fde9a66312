#!/usr/bin/env python3
"""Multi-process launcher for the dlrm_tpu trainers — the working analog of
the reference's torchx ddp component (torchrec_dlrm/aws_component.py:13-42,
`torchx run ... aws_component.py:run_dlrm_main -- <script_args>`).

Two modes:

  * single host (default): spawn --nproc local processes, each running the
    chosen trainer module with DLRM_COORDINATOR / DLRM_NUM_PROCESSES /
    DLRM_PROCESS_ID exported; the trainers call
    `multihost.init_multihost()` which reads that env and performs the
    jax.distributed rendezvous (the torchx `j=RxN` role).  On CPU the
    launcher also grants each process a virtual-device slice via
    --devices-per-proc so shardings are exercised for real.

  * --print-cmds: emit the per-host command lines (rank, coordinator env)
    for a multi-host TPU pod slice, where an external scheduler (GKE /
    xmanager / mpirun) starts one process per host.  On real TPU pods
    jax.distributed auto-discovers the topology, so the env block is the
    only thing the scheduler must provide.

Mirrors the reference's shape constraint: trainer counts above one host
must be a multiple of the per-host process count (aws_component.py:25-29).

Usage:
  python scripts/launch.py --nproc 2 -m dlrm_tpu.cli -- \
      --arch-embedding-size 100-200 --sharded ...
  python scripts/launch.py --nproc 2 -m dlrm_tpu.v2_main -- \
      --sharded --embedding_impl scatter ...
"""

from __future__ import annotations

import argparse
import os
import signal
import socket
import subprocess
import sys


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="torchx-ddp-analog launcher (aws_component.py role)"
    )
    p.add_argument("--nproc", type=int, default=2,
                   help="total trainer processes (torchx num_trainers)")
    p.add_argument("--nproc-per-host", type=int, default=None,
                   help="processes per host (default: all local)")
    p.add_argument("-m", "--module", default="dlrm_tpu.cli",
                   help="trainer module (dlrm_tpu.cli or dlrm_tpu.v2_main)")
    p.add_argument("--coordinator", default=None,
                   help="host:port rendezvous address "
                   "(default: localhost:<free port>)")
    p.add_argument("--devices-per-proc", type=int, default=0,
                   help="CPU-only: give each process N virtual devices "
                   "(xla_force_host_platform_device_count)")
    p.add_argument("--print-cmds", action="store_true",
                   help="print per-rank command lines instead of spawning "
                   "(multi-host scheduler integration)")
    p.add_argument("script_args", nargs=argparse.REMAINDER,
                   help="args after -- go to the trainer")
    args = p.parse_args(argv)

    per_host = args.nproc_per_host or args.nproc
    if args.nproc > per_host and args.nproc % per_host != 0:
        # aws_component.py:25-29's multiple-of-8 rule, generalized
        raise SystemExit(
            f"ERROR: {args.nproc} trainers spanning multiple hosts must be "
            f"a multiple of --nproc-per-host ({per_host})"
        )
    trainer_args = args.script_args
    if trainer_args and trainer_args[0] == "--":
        trainer_args = trainer_args[1:]
    coord = args.coordinator or f"localhost:{_free_port()}"

    def env_for(rank: int) -> dict:
        env = dict(os.environ)
        env["DLRM_COORDINATOR"] = coord
        env["DLRM_NUM_PROCESSES"] = str(args.nproc)
        env["DLRM_PROCESS_ID"] = str(rank)
        if args.devices_per_proc:
            env["JAX_PLATFORMS"] = "cpu"
            env["XLA_FLAGS"] = (
                env.get("XLA_FLAGS", "")
                + f" --xla_force_host_platform_device_count="
                f"{args.devices_per_proc}"
            ).strip()
        return env

    cmd = [sys.executable, "-m", args.module] + trainer_args
    if args.print_cmds:
        for r in range(args.nproc):
            env = env_for(r)
            keys = ["DLRM_COORDINATOR", "DLRM_NUM_PROCESSES",
                    "DLRM_PROCESS_ID"]
            kv = " ".join(f"{k}={env[k]}" for k in keys)
            print(f"host {r // per_host} rank {r}: {kv} "
                  + " ".join(cmd))
        return 0

    procs = []
    try:
        for r in range(args.nproc):
            procs.append(subprocess.Popen(cmd, env=env_for(r)))
        # fail-fast supervision (the torchelastic role this launcher
        # mirrors): one dead trainer leaves its peers blocked in
        # collectives forever, so on the FIRST non-zero exit the group is
        # torn down and that rank's code is reported
        import time as _time

        rc = 0
        live = set(range(args.nproc))
        while live:
            for r in sorted(live):
                code = procs[r].poll()
                if code is None:
                    continue
                live.discard(r)
                if code != 0:
                    print(
                        f"launch: rank {r} exited with code {code}; "
                        "terminating remaining ranks",
                        file=sys.stderr,
                    )
                    for pr in procs:
                        if pr.poll() is None:
                            pr.terminate()
                    for pr in procs:
                        pr.wait()
                    return code
            if live:
                _time.sleep(0.2)
        return rc
    except KeyboardInterrupt:
        for pr in procs:
            if pr.poll() is None:
                pr.send_signal(signal.SIGINT)
        for pr in procs:
            pr.wait()
        return 130
    finally:
        for pr in procs:
            if pr.poll() is None:
                pr.kill()


if __name__ == "__main__":
    sys.exit(main())
