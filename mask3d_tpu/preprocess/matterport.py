"""Matterport3D region merge (P4).

Rebuild of `datasets_preprocess/Matterport3D/download_and_preprocess.py:23-96`:
merge a scan's per-region `.ply` files into one labelled cloud, assigning
`room_id = region_index + 1` and `type = 1`, converting meters to
millimeters; regions are processed in sorted order (the reference sorts
"maybe as a workaround for reproducibility issues", `:45`).
"""

from __future__ import annotations

import os
import re
from typing import List

import numpy as np

from mask3d_tpu.data.las import write_las
from mask3d_tpu.data.ply import read_ply, write_ply


def merge_regions(region_dir: str) -> dict:
    files: List[str] = sorted(
        f for f in os.listdir(region_dir) if re.fullmatch(r"region\d+\.ply", f)
    )
    coords_all, rooms_all = [], []
    for idx, fname in enumerate(files):
        v = read_ply(os.path.join(region_dir, fname))
        coords = np.stack([v["x"], v["y"], v["z"]], axis=1).astype(np.float64)
        coords *= 1000.0  # m -> mm
        coords_all.append(coords)
        rooms_all.append(np.full(len(coords), idx + 1, np.int32))
    coords = np.concatenate(coords_all) if coords_all else np.zeros((0, 3))
    rooms = np.concatenate(rooms_all) if rooms_all else np.zeros(0, np.int32)
    return {
        "coords": coords,
        "types": np.ones(len(coords), np.int32),
        "room_ids": rooms,
    }


def preprocess_scan(scan_dir: str, out_dir: str) -> dict:
    import traceback

    scan = os.path.basename(scan_dir.rstrip("/"))
    try:
        region_dir = os.path.join(scan_dir, "region_segmentations")
        if not os.path.isdir(region_dir):
            region_dir = scan_dir
        pc = merge_regions(region_dir)
        os.makedirs(out_dir, exist_ok=True)
        write_ply(
            os.path.join(out_dir, "point_cloud.ply"),
            {
                "x": pc["coords"][:, 0].astype(np.float32),
                "y": pc["coords"][:, 1].astype(np.float32),
                "z": pc["coords"][:, 2].astype(np.float32),
                "type": pc["types"],
                "room_id": pc["room_ids"],
            },
        )
        write_las(
            os.path.join(out_dir, "point_cloud.las"),
            pc["coords"],
            extra_dims={"type": pc["types"], "room_id": pc["room_ids"]},
        )
        return {"scene": scan, "success": True}
    except Exception:
        return {
            "scene": scan,
            "success": False,
            "exception": traceback.format_exc(),
        }


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description="Merge Matterport3D regions")
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--out_root", required=True)
    args = ap.parse_args(argv)
    scans = sorted(
        s for s in os.listdir(args.data_root)
        if os.path.isdir(os.path.join(args.data_root, s))
    )
    results = [
        preprocess_scan(
            os.path.join(args.data_root, s), os.path.join(args.out_root, s)
        )
        for s in scans
    ]
    bad = [r for r in results if not r["success"]]
    for r in bad:
        print(f"FAILED {r['scene']}:\n{r['exception']}")
    print(f"{len(results) - len(bad)} scans merged, {len(bad)} failed")


if __name__ == "__main__":
    main()
