#!/bin/bash
# Download the Criteo 1TB Click Logs dataset (24 day files) — the
# counterpart of torchrec_dlrm/scripts/download_Criteo_1TB_Click_Logs_dataset.sh.
# Usage: bash scripts/download_criteo_1tb.sh <output_dir>
set -e
[ -z "$1" ] && { echo "usage: $0 <output_dir>"; exit 1; }
out=$(readlink -m "$1"); mkdir -p "$out"
for day in {0..23}; do
  url="https://sacriteopcail01.z16.web.core.windows.net/day_${day}.gz"
  echo "fetching day_${day}"
  curl -fL "$url" -o "$out/day_${day}.gz"
  gunzip -f "$out/day_${day}.gz"
done
echo "done: $out/day_{0..23}"
