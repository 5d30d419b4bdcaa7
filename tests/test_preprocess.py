"""Preprocessing pipeline tests: geometry, unprojection, labeling,
downsampling, Matterport merge — vs brute-force/synthetic oracles."""

import json
import os

import numpy as np
import pytest

from mask3d_tpu.preprocess.geometry import (
    points_in_polygon,
    points_match_polygon,
    points_to_polygon_distance,
    polygon_area,
)
from mask3d_tpu.preprocess.downsample import downsample_point_cloud
from mask3d_tpu.preprocess.stru3d import (
    PanoramaSceneConverter,
    extract_floor_polygons,
    label_points,
    unproject_panorama,
)


def test_polygon_area_and_containment():
    square = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float)
    assert polygon_area(square) == pytest.approx(100.0)
    pts = np.array([[5, 5], [15, 5], [-1, 2], [9.99, 9.99]])
    inside = points_in_polygon(pts, square)
    assert inside.tolist() == [True, False, False, True]
    # reversed orientation must give the same result
    inside_r = points_in_polygon(pts, square[::-1])
    assert inside_r.tolist() == inside.tolist()


def test_polygon_distance_and_buffer():
    square = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float)
    pts = np.array([[5, -3], [12, 5], [5, 5]])
    d = points_to_polygon_distance(pts, square)
    np.testing.assert_allclose(d, [3, 2, 5])
    m = points_match_polygon(pts, square, buffer=2.5)
    assert m.tolist() == [False, True, True]


def test_concave_polygon():
    # L-shape: point in the notch is outside
    L = np.array([[0, 0], [10, 0], [10, 4], [4, 4], [4, 10], [0, 10]], float)
    pts = np.array([[2, 2], [8, 2], [2, 8], [8, 8]])
    assert points_in_polygon(pts, L).tolist() == [True, True, True, False]
    assert polygon_area(L) == pytest.approx(10 * 4 + 4 * 6)


def test_unprojection_geometry():
    """A constant-depth panorama maps to a sphere around the camera."""
    h, w = 64, 128
    depth = np.full((h, w), 2000.0)
    center = np.array([100.0, 200.0, 300.0])
    pts = unproject_panorama(depth, center)
    r = np.linalg.norm(pts - center, axis=1)
    np.testing.assert_allclose(r, 2000.0, rtol=1e-6)
    # depth below the 500mm cutoff produces nothing
    assert len(unproject_panorama(np.full((h, w), 400.0), center)) == 0
    # nadir pixel (x = h-1) points almost straight down
    depth2 = np.zeros((h, w))
    depth2[h - 1, 0] = 1000.0
    p = unproject_panorama(depth2, np.zeros(3))
    assert p[0, 2] < -970


def test_label_points_priorities():
    polygons = [
        {"coords2d": np.array([[0, 0], [100, 0], [100, 100], [0, 100]],
                              float),
         "semantic_type": "bedroom", "room_id": 1},
        # door overlapping the bedroom partially
        {"coords2d": np.array([[90, 40], [130, 40], [130, 60], [90, 60]],
                              float),
         "semantic_type": "door", "room_id": 0},
        # invalid sliver
        {"coords2d": np.array([[200, 0], [210, 0], [210, 10], [200, 10]],
                              float),
         "semantic_type": "invalid", "room_id": 0},
    ]
    pts = np.array(
        [
            [50, 50],    # bedroom only
            [95, 50],    # bedroom + door -> bedroom wins (high priority)
            [120, 50],   # door only
            [205, 5],    # invalid only (single match keeps invalid type)
            [500, 500],  # nothing
        ],
        float,
    )
    types, rooms = label_points(pts, polygons)
    assert types.tolist() == [3, 3, 17, 21, 0]
    assert rooms.tolist() == [1, 1, 0, 0, 0]


def make_annotation():
    """Two square floor rooms + one tiny undefined polygon."""
    junctions = []
    lines = []
    planes = []
    plane_line_matrix = []
    line_junction_matrix = []
    semantics = []

    def add_square(x0, y0, size, sem_type, plane_id_start):
        j0 = len(junctions)
        pts = [
            (x0, y0), (x0 + size, y0), (x0 + size, y0 + size), (x0, y0 + size)
        ]
        for i, (x, y) in enumerate(pts):
            junctions.append({"ID": j0 + i, "coordinate": [x, y, 0.0]})
        l0 = len(lines)
        for i in range(4):
            lines.append(l0 + i)
        n_lines_total = 16  # fixed-size matrices for simplicity
        plane_id = len(planes)
        planes.append({"type": "floor", "ID": plane_id})
        row = [0] * n_lines_total
        for i in range(4):
            row[l0 + i] = 1
        plane_line_matrix.append(row)
        n_junc_total = 16
        for i in range(4):
            jr = [0] * n_junc_total
            jr[j0 + i] = 1
            jr[j0 + (i + 1) % 4] = 1
            line_junction_matrix.append(jr)
        semantics.append({"ID": len(semantics), "planeID": [plane_id],
                          "type": sem_type})

    add_square(0, 0, 5000, "bedroom", 0)
    add_square(6000, 0, 5000, "kitchen", 1)
    add_square(12000, 0, 500, "undefined", 2)  # 0.25 m^2 -> invalid

    return {
        "junctions": junctions,
        "planes": planes,
        "planeLineMatrix": plane_line_matrix,
        "lineJunctionMatrix": line_junction_matrix,
        "semantics": semantics,
    }


def test_extract_floor_polygons():
    ann = make_annotation()
    polys = extract_floor_polygons(ann)
    assert len(polys) == 3
    assert [p["semantic_type"] for p in polys] == [
        "bedroom", "kitchen", "invalid"
    ]
    assert [p["room_id"] for p in polys] == [1, 2, 0]
    assert polygon_area(polys[0]["coords2d"]) == pytest.approx(25e6)


def test_panorama_scene_end_to_end(tmp_path):
    """Synthetic scene dir -> converter -> labelled cloud with 2 rooms."""
    import cv2

    scene = tmp_path / "scene_00042"
    ann = make_annotation()
    os.makedirs(scene)
    with open(scene / "annotation_3d.json", "w") as f:
        json.dump(ann, f)
    # one panorama per room, camera at the room center, constant depth
    for i, cam in enumerate([(2500, 2500, 1400), (8500, 2500, 1400)]):
        pano = scene / "2D_rendering" / str(i) / "panorama"
        os.makedirs(pano / "full")
        depth = np.full((64, 128), 2000, np.uint16)
        cv2.imwrite(str(pano / "full" / "depth.png"), depth)
        with open(pano / "camera_xyz.txt", "w") as f:
            f.write(f"{cam[0]} {cam[1]} {cam[2]} 0 0 0")

    conv = PanoramaSceneConverter(str(scene))
    pc = conv.export(str(scene / "point_cloud.ply"),
                     str(scene / "point_cloud.las"))
    assert len(pc["coords"]) > 1000
    room_ids = set(np.unique(pc["room_ids"]).tolist())
    assert {1, 2} <= room_ids
    # points from camera 0's sphere that fall in room 1 -> bedroom type 3
    in_room1 = pc["room_ids"] == 1
    assert (pc["types"][in_room1] == 3).all()
    # coordinates rounded to the 10mm / 100mm grid
    assert np.allclose(pc["coords"][:, :2] % 10, 0)
    assert np.allclose(pc["coords"][:, 2] % 100, 0)
    # artifacts readable back
    from mask3d_tpu.data.ply import read_ply

    v = read_ply(str(scene / "point_cloud.ply"))
    assert len(v["x"]) == len(pc["coords"])


def test_downsample_matches_bruteforce(rng):
    n = 2000
    coords = rng.uniform(-5000, 5000, (n, 3))
    types = rng.integers(0, 21, n).astype(np.int32)
    rooms = rng.integers(0, 9, n).astype(np.int32)
    vs = 150
    cuboid, sparse = downsample_point_cloud(coords, types, rooms, vs)

    mins = coords.min(0)
    vox = np.floor((coords - mins) / vs).astype(np.int64)
    # first-occurrence-per-voxel in np.unique order
    _, keep = np.unique(vox, axis=0, return_index=True)
    assert len(sparse["x"]) == len(keep)
    assert np.array_equal(sparse["type"], types[keep])
    # cuboid has labels exactly at kept voxels
    filled = np.nonzero(cuboid[..., 1] != 0)
    kept_with_room = vox[keep][rooms[keep] != 0]
    assert len(filled[0]) == len(np.unique(kept_with_room, axis=0))


def test_matterport_merge(tmp_path, rng):
    from mask3d_tpu.data.ply import write_ply
    from mask3d_tpu.preprocess.matterport import merge_regions

    d = tmp_path / "regions"
    os.makedirs(d)
    for i in range(3):
        n = 50
        write_ply(
            str(d / f"region{i}.ply"),
            {
                "x": rng.normal(size=n).astype(np.float32),
                "y": rng.normal(size=n).astype(np.float32),
                "z": rng.normal(size=n).astype(np.float32),
            },
            text=False,
        )
    pc = merge_regions(str(d))
    assert len(pc["coords"]) == 150
    assert set(np.unique(pc["room_ids"]).tolist()) == {1, 2, 3}
    assert (pc["types"] == 1).all()


def test_matterport_download_driver(tmp_path, rng):
    """Download driver honoring the user-supplied download_mp contract
    (reference download_and_preprocess.py:92-147): a fake download_mp
    'downloads' a region_segmentations.zip; the driver unzips, merges,
    writes point_cloud.las (with RGB), cleans temp, and skips
    already-preprocessed scans on rerun."""
    import zipfile

    from mask3d_tpu.data.las import read_las
    from mask3d_tpu.data.ply import write_ply
    from mask3d_tpu.preprocess.matterport import download_and_preprocess

    # Build the zip a download would deliver: scan/region_segmentations/*.ply
    src = tmp_path / "payload"
    os.makedirs(src / "scanA" / "region_segmentations")
    for i in range(2):
        n = 40
        write_ply(
            str(src / "scanA" / "region_segmentations" / f"region{i}.ply"),
            {
                "x": rng.normal(size=n).astype(np.float32),
                "y": rng.normal(size=n).astype(np.float32),
                "z": rng.normal(size=n).astype(np.float32),
                "red": rng.integers(0, 255, n).astype(np.uint8),
                "green": rng.integers(0, 255, n).astype(np.uint8),
                "blue": rng.integers(0, 255, n).astype(np.uint8),
            },
            text=False,
        )
    zip_src = tmp_path / "region_segmentations.zip"
    with zipfile.ZipFile(zip_src, "w") as z:
        for p in sorted((src / "scanA" / "region_segmentations").iterdir()):
            z.write(p, f"scanA/region_segmentations/{p.name}")

    fake_mp = tmp_path / "download_mp.py"
    fake_mp.write_text(f"""
import os, shutil
BASE_URL = "http://example.invalid/"
RELEASE = "v1"
CALLS = []
def get_release_scans(release_file):
    return ["scanA", "scanB"]
def download_scan(scan_id, out_dir, file_types):
    CALLS.append((scan_id, tuple(file_types)))
    os.makedirs(out_dir, exist_ok=True)
    shutil.copy({str(zip_src)!r},
                os.path.join(out_dir, "region_segmentations.zip"))
""")

    out = tmp_path / "mp_out"
    results = download_and_preprocess(str(out), "scanA", str(fake_mp))
    assert [r["success"] for r in results] == [True]
    las_path = out / "preprocessed" / "v1" / "scanA" / "point_cloud.las"
    assert las_path.exists()
    data = read_las(str(las_path))
    assert len(data["xyz"]) == 80
    assert set(np.unique(data["room_id"]).tolist()) == {1, 2}
    assert "rgb" in data or "red" in data  # colors preserved
    # temp download removed
    assert not (out / "temp" / "v1" / "scanA").exists()
    # rerun skips
    results2 = download_and_preprocess(str(out), "scanA", str(fake_mp))
    assert results2[0].get("skipped") is True
    # unknown scan id rejected like the reference
    import pytest as _pytest

    with _pytest.raises(ValueError):
        download_and_preprocess(str(out), "nope", str(fake_mp))
