"""Offline dataset preparation (reference `datasets_preprocess/`):

- `stru3d`      — Structured3D panorama -> labelled point cloud (P1/P2)
- `downsample`  — voxel-grid downsampling of .ply clouds (P3)
- `matterport`  — Matterport3D region merge (P4)
- `geometry`    — vectorized polygon ops (shapely replacement)
- `analyze`     — dataset statistics reports (P5)

All pipelines are vectorized numpy (the reference labels points one by one
through shapely, `point_cloud_reader_stru3d.py:268-386` — its own TODO calls
that path "too slow").
"""
