#!/bin/bash
# Out-of-band fallback for GRIB2 packing template 5.40 (JPEG2000).
#
# graft's pure-JVM GRIB2 reader (sources/grib/Grib2File.scala) decodes
# simple (5.0), complex (5.2/5.3), and PNG (5.41) packing. JPEG2000
# needs a full EBCOT/MQ-coder codec that no JVM ships; eccodes itself
# delegates 5.40 to the openjpeg C library. Rather than embed a fragile
# hand-rolled codec, 5.40 files are repacked LOSSLESSLY to complex
# packing with the standard eccodes tool — integer-packed values are
# identical under every template; only the byte encoding changes.
#
# Usage: tools/grib2_j2k_repack.sh in_540.grib2 out_complex.grib2
# Requires: eccodes (apt install libeccodes-tools / conda eccodes).
set -euo pipefail
if [ $# -ne 2 ]; then
  echo "usage: $0 <in_540.grib2> <out_complex.grib2>" >&2
  exit 2
fi
if ! command -v grib_set >/dev/null 2>&1; then
  cat >&2 <<'EOF'
grib_set not found. This repack needs eccodes, which is not bundled
(it is the same C dependency the reference platform carries for ALL
its GRIB decoding; graft only needs it for the rare 5.40-packed file).
Install one of:
  apt-get install libeccodes-tools
  conda install -c conda-forge eccodes
then re-run. The conversion is lossless: grib_set rewrites the packed
integers under grid_complex packing without touching the values.
EOF
  exit 3
fi
grib_set -r -s packingType=grid_complex "$1" "$2"
echo "repacked: $2 (verify with grib_ls -p packingType $2)"
