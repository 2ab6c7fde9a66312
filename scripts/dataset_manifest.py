#!/usr/bin/env python3
"""Generate / verify md5 manifests of a preprocessed dataset directory —
the working analog of the reference's shipped checksum files
(torchrec_dlrm/md5sums_preprocessed_criteo_click_logs_dataset.txt and
md5sums_MLPerf_v2_synthetic_multi_hot_sparse_dataset.txt, referenced by
README.MD:83,150): after the 1-2-day preprocessing pass, users diff their
outputs against the published hashes before training.

The reference can ship static hashes because its output layout is fixed;
ours differ (npz day files / packed bins / materialized multi-hot npys),
so the equivalent workflow is: run the preprocess once on a trusted
machine, `generate` the manifest, commit it next to the dataset, and every
other machine `verify`s before training.  Preprocessing here is
deterministic (cross-day shuffle is seeded and bit-equal between the
in-RAM and out-of-core paths, data/criteo_stream.py), so hashes are
reproducible across runs and machines.

Usage:
  python scripts/dataset_manifest.py generate DIR [-o md5sums.txt]
      [--glob '*.npz' --glob '*.bin' ...]
  python scripts/dataset_manifest.py verify DIR [-m md5sums.txt]

Exit code 0 iff every manifest entry exists and matches (verify) or the
manifest was written (generate).  Format matches md5sum(1) / the
reference's files: "<hex32>  <relative path>" per line.
"""

from __future__ import annotations

import argparse
import fnmatch
import hashlib
import os
import sys

# dataset artifacts the dlrm_tpu pipelines emit (criteo_stream day npz/npy
# outputs, packed bins, materialized multi-hot days, count/dict sidecars)
DEFAULT_GLOBS = ("*.npz", "*.npy", "*.bin", "*.npz.meta")


def _md5(path: str, chunk: int = 1 << 22) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def _matching_files(root: str, globs) -> list:
    out = []
    for dirpath, _, names in os.walk(root):
        for n in sorted(names):
            if any(fnmatch.fnmatch(n, g) for g in globs):
                out.append(
                    os.path.relpath(os.path.join(dirpath, n), root)
                )
    return sorted(out)


def generate(root: str, manifest: str, globs) -> int:
    files = _matching_files(root, globs)
    if not files:
        print(f"ERROR: no files matching {globs} under {root}",
              file=sys.stderr)
        return 1
    with open(manifest, "w") as f:
        for rel in files:
            digest = _md5(os.path.join(root, rel))
            f.write(f"{digest}  {rel}\n")
            print(f"{digest}  {rel}")
    print(f"[manifest] wrote {len(files)} entries -> {manifest}")
    return 0


def verify(root: str, manifest: str) -> int:
    bad = missing = n = 0
    with open(manifest) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            digest, rel = line.split(None, 1)
            n += 1
            path = os.path.join(root, rel)
            if not os.path.exists(path):
                print(f"MISSING  {rel}")
                missing += 1
            elif _md5(path) != digest:
                print(f"MISMATCH {rel}")
                bad += 1
    status = "OK" if not (bad or missing) else "FAILED"
    print(f"[manifest] {status}: {n} entries, {bad} mismatched, "
          f"{missing} missing")
    return 0 if status == "OK" else 1


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    g = sub.add_parser("generate")
    g.add_argument("dir")
    g.add_argument("-o", "--manifest", default=None,
                   help="output file (default: DIR/md5sums.txt)")
    g.add_argument("--glob", action="append", default=None,
                   help=f"filename globs to hash (default {DEFAULT_GLOBS})")
    v = sub.add_parser("verify")
    v.add_argument("dir")
    v.add_argument("-m", "--manifest", default=None,
                   help="manifest to check (default: DIR/md5sums.txt)")
    args = p.parse_args(argv)

    manifest = args.manifest or os.path.join(args.dir, "md5sums.txt")
    if args.cmd == "generate":
        return generate(args.dir, manifest, args.glob or DEFAULT_GLOBS)
    return verify(args.dir, manifest)


if __name__ == "__main__":
    sys.exit(main())
