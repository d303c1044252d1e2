#!/usr/bin/env bash
# Download the training data (~18 GB): the global 100 m LROC WAC mosaic and
# the six SLDEM2015 256 px/deg float tiles covering +/-60 deg latitude.
# Same sources the reference pipeline uses (reference: get_data.sh:1-11);
# mirrors are USGS Astrogeology and the LOLA PDS node.
#
# Usage: ./scripts/get_data.sh [target_dir]
set -euo pipefail
DEST="${1:-data}"
mkdir -p "$DEST"
cd "$DEST"

WAC_BASE="https://planetarymaps.usgs.gov/mosaic"
SLDEM_BASE="https://imbrium.mit.edu/DATA/SLDEM2015/TILES/FLOAT_IMG"

fetch() {
  local url="$1"
  local name
  name="$(basename "$url")"
  if [[ -f "$name" ]]; then
    echo "skip $name (exists)"
  else
    wget -c "$url"
  fi
}

fetch "$WAC_BASE/Lunar_LRO_LROC-WAC_Mosaic_global_100m_June2013.tif"

for tile in \
  SLDEM2015_256_0N_60N_000_120_FLOAT.IMG \
  SLDEM2015_256_0N_60N_120_240_FLOAT.IMG \
  SLDEM2015_256_0N_60N_240_360_FLOAT.IMG \
  SLDEM2015_256_60S_0S_000_120_FLOAT.IMG \
  SLDEM2015_256_60S_0S_120_240_FLOAT.IMG \
  SLDEM2015_256_60S_0S_240_360_FLOAT.IMG; do
  fetch "$SLDEM_BASE/$tile"
  # the pipeline expects lowercase names (data/h5_builder.py DEM_FILES)
  lc="$(echo "$tile" | tr '[:upper:]' '[:lower:]')"
  [[ -f "$lc" ]] || ln -sf "$tile" "$lc"
done

echo "done. next steps:"
echo "  moonsr-tile-wac --mosaic $DEST/Lunar_LRO_LROC-WAC_Mosaic_global_100m_June2013.tif --output_path $DEST"
echo "  moonsr-make-h5 --data_path $DEST --output_path ."
