#!/usr/bin/env bash
# Fetch the standard NeRF example datasets (Blender synthetic + LLFF) into
# ./data, matching the layout the loaders expect:
#
#   data/nerf_synthetic/<scene>/transforms_{train,val,test}.json + PNGs
#   data/nerf_llff_data/<scene>/images/ + poses_bounds.npy
#
# Equivalent of the reference's scripts/data/download_example_data.sh
# (same upstream archives). Run from the repository root.
set -euo pipefail

mkdir -p data
cd data

wget -nc http://cseweb.ucsd.edu/~viscomp/projects/LF/papers/ECCV20/nerf/tiny_nerf_data.npz
wget -nc http://cseweb.ucsd.edu/~viscomp/projects/LF/papers/ECCV20/nerf/nerf_example_data.zip
unzip -n nerf_example_data.zip

cd ..
echo "Datasets ready under ./data. No network? Use dataset_type=gaussian_blobs"
echo "(a procedurally generated posed-image set) for smoke runs instead."
