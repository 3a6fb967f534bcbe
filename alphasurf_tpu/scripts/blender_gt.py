"""Blender ground-truth renderer for NeRF-synthetic-style datasets.

Runs INSIDE Blender's bundled Python (bpy is only importable there):

    blender -b scene.blend -P blender_gt.py -- train  <out_dir> [--views 100] [--resolution 800]
    blender -b scene.blend -P blender_gt.py -- replay <transforms.json> <out_dir> [--depth-only]
    blender -b scene.blend -P blender_gt.py -- demo   <out_dir> [--views 60]

Fresh consolidation of the reference's four bpy scripts
(``opt/scripts/blender_render_train.py`` 1-173: random upper-hemisphere
training views + camera_angle_x JSON + EXR depth passes;
``blender_render_test.py``/``blender_depth_renderer.py``: re-render RGB or
depth from an existing transforms JSON; ``blender_render_demo.py``: a
turntable demo path). One compositor graph serves all modes. The depth
EXRs pair with ``alphasurf_tpu.app.data_vis.depth_to_points`` to produce
the chamfer-GT ``shape.npy``.

Untestable in this repo's CI (no Blender); kept deliberately small and
side-effect-explicit.
"""
import argparse
import json
import math
import os
import random
import sys

import bpy  # noqa: F401  (resolves only inside Blender)
import mathutils


def _parse():
    argv = sys.argv[sys.argv.index("--") + 1:] if "--" in sys.argv else []
    p = argparse.ArgumentParser(prog="blender_gt.py")
    sub = p.add_subparsers(dest="mode", required=True)
    t = sub.add_parser("train")
    t.add_argument("out_dir")
    t.add_argument("--views", type=int, default=100)
    t.add_argument("--resolution", type=int, default=800)
    t.add_argument("--all-views", action="store_true",
                   help="sample the full sphere (default: upper hemisphere)")
    r = sub.add_parser("replay")
    r.add_argument("transforms_json")
    r.add_argument("out_dir")
    r.add_argument("--depth-only", action="store_true")
    r.add_argument("--resolution", type=int, default=800)
    d = sub.add_parser("demo")
    d.add_argument("out_dir")
    d.add_argument("--views", type=int, default=60)
    d.add_argument("--resolution", type=int, default=800)
    return p.parse_args(argv)


def _setup_render(resolution: int, out_dir: str, want_depth: bool):
    """Transparent-film EXR-depth compositor shared by every mode."""
    scene = bpy.context.scene
    scene.render.use_persistent_data = True
    scene.render.dither_intensity = 0.0
    scene.render.film_transparent = True
    scene.render.resolution_x = resolution
    scene.render.resolution_y = resolution
    scene.render.resolution_percentage = 100
    scene.render.image_settings.file_format = "PNG"
    scene.render.image_settings.color_mode = "RGBA"
    depth_out = None
    if want_depth:
        scene.view_layers[0].use_pass_z = True
        scene.use_nodes = True
        tree = scene.node_tree
        tree.nodes.clear()
        rl = tree.nodes.new("CompositorNodeRLayers")
        depth_out = tree.nodes.new("CompositorNodeOutputFile")
        depth_out.label = "Depth Output"
        depth_out.base_path = out_dir
        depth_out.format.file_format = "OPEN_EXR"
        depth_out.format.color_depth = "32"
        tree.links.new(rl.outputs["Depth"], depth_out.inputs[0])
    return scene, depth_out


def _orbit_rig():
    """Parent the scene camera to an origin empty: rotating the empty
    orbits the camera (the reference's parent_obj_to_camera pattern)."""
    cam = bpy.context.scene.camera or bpy.data.objects["Camera"]
    empty = bpy.data.objects.new("GTOrbitEmpty", None)
    empty.location = (0.0, 0.0, 0.0)
    bpy.context.scene.collection.objects.link(empty)
    cam.parent = empty
    constraint = cam.constraints.new(type="TRACK_TO")
    constraint.target = empty
    return cam, empty


def _frame(scene, depth_out, stem):
    scene.render.filepath = stem
    if depth_out is not None:
        depth_out.file_slots[0].path = os.path.basename(stem) + "_depth_"
    bpy.ops.render.render(write_still=True)


def _matrix_list(m):
    return [list(row) for row in m]


def mode_train(args):
    os.makedirs(args.out_dir, exist_ok=True)
    scene, depth_out = _setup_render(args.resolution, args.out_dir, True)
    cam, empty = _orbit_rig()
    meta = {"camera_angle_x": cam.data.angle_x, "frames": []}
    rng = random.Random(0)
    for i in range(args.views):
        # uniform over the (upper hemi)sphere via rejection-free sampling
        az = rng.uniform(0.0, 2.0 * math.pi)
        zmin = 0.0 if not args.all_views else -1.0
        el = math.asin(rng.uniform(zmin, 1.0))
        empty.rotation_euler = (0.0, 0.0, 0.0)
        dist = (cam.location - mathutils.Vector((0, 0, 0))).length
        cam.location = (
            dist * math.cos(el) * math.cos(az),
            dist * math.cos(el) * math.sin(az),
            dist * math.sin(el),
        )
        bpy.context.view_layer.update()
        stem = os.path.join(args.out_dir, f"r_{i}")
        _frame(scene, depth_out, stem)
        meta["frames"].append({
            "file_path": f"./train/r_{i}",
            "rotation": 2.0 * math.pi / args.views,
            "transform_matrix": _matrix_list(cam.matrix_world),
        })
    with open(os.path.join(args.out_dir, "transforms_train.json"), "w") as f:
        json.dump(meta, f, indent=2)


def mode_replay(args):
    os.makedirs(args.out_dir, exist_ok=True)
    scene, depth_out = _setup_render(args.resolution, args.out_dir, True)
    with open(args.transforms_json) as f:
        meta = json.load(f)
    cam = scene.camera or bpy.data.objects["Camera"]
    cam.data.angle_x = float(meta["camera_angle_x"])
    if args.depth_only:
        # skip the (expensive) beauty pass: render at 1 sample
        scene.cycles.samples = 1 if scene.render.engine == "CYCLES" else None
    for i, frame in enumerate(meta["frames"]):
        cam.matrix_world = mathutils.Matrix(frame["transform_matrix"])
        bpy.context.view_layer.update()
        _frame(scene, depth_out, os.path.join(args.out_dir, f"r_{i}"))


def mode_demo(args):
    os.makedirs(args.out_dir, exist_ok=True)
    scene, depth_out = _setup_render(args.resolution, args.out_dir, False)
    cam, _ = _orbit_rig()
    dist = (cam.location - mathutils.Vector((0, 0, 0))).length
    el = math.radians(30.0)
    for i in range(args.views):
        az = 2.0 * math.pi * i / args.views
        cam.location = (
            dist * math.cos(el) * math.cos(az),
            dist * math.cos(el) * math.sin(az),
            dist * math.sin(el),
        )
        bpy.context.view_layer.update()
        _frame(scene, depth_out, os.path.join(args.out_dir, f"demo_{i:04d}"))


if __name__ == "__main__":
    a = _parse()
    {"train": mode_train, "replay": mode_replay, "demo": mode_demo}[a.mode](a)
