"""NumPy oracle renderer: Scene -> RGBA image.

The full pipeline executed under numpy. This is the test oracle and the
executable spec for the device pipeline (which runs the *same* pipeline
code under jax.numpy plus Pallas kernels).
"""

from __future__ import annotations

import numpy as np

from ..gfx import premul32
from ..pipeline import render as render_mod
from ..pipeline.fine_ref import assemble_image
from ..renderer.estimate import estimate_caps_from_scene, grow_caps
from ..renderer.params import RenderParams
from ..renderer.resolve import Resolver


def build_layout_dict(layout, params: RenderParams):
    width = params.width
    height = params.height
    wit = (width + 15) // 16
    hit = (height + 15) // 16
    return {
        "path_tag_base": np.int32(layout.path_tag_base),
        "path_data_base": np.int32(layout.path_data_base),
        "draw_tag_base": np.int32(layout.draw_tag_base),
        "draw_data_base": np.int32(layout.draw_data_base),
        "transform_base": np.int32(layout.transform_base),
        "style_base": np.int32(layout.style_base),
        "n_path_tags": np.int32(layout.n_path_tags),
        "n_paths": np.int32(layout.n_paths),
        "n_draw_objects": np.int32(layout.n_draw_objects),
        "n_clips": np.int32(layout.n_clips),
        "width_in_tiles": np.int32(wit),
        "height_in_tiles": np.int32(hit),
        "target_width": np.int32(width),
        "target_height": np.int32(height),
        "base_color": premul32(params.base_color),
    }


def build_image_atlas(atlas):
    """Materialize the resolver's shelf-packed ImageAtlas into one
    [AH, AW, 4] f32 plane (values /255, no sRGB decode — the reference
    samples Rgba8Unorm textures; packing scheme of resolve.go:128-149).
    AH/AW are already 8/128-quantized by the packer."""
    if atlas is None or not len(atlas):
        return None
    plane = np.zeros((atlas.height, atlas.width, 4), dtype=np.float32)
    for img, (ax, ay) in zip(atlas.images, atlas.placements):
        plane[ay : ay + img.height, ax : ax + img.width] = (
            np.asarray(img.pixels, dtype=np.float32) / 255.0
        )
    return plane


def render(scene, params: RenderParams, resolver: Resolver | None = None,
           caps: dict | None = None, max_retries: int = 4):
    """Render a Scene (or Encoding) to an [H, W, 4] float32 image."""
    enc = scene.encoding if hasattr(scene, "encoding") else scene
    resolver = resolver or Resolver()
    layout, ramps, images, scene_u32 = resolver.resolve(enc)
    ld = build_layout_dict(layout, params)
    caps = caps or estimate_caps_from_scene(scene_u32, layout, params.width, params.height)
    caps.setdefault("aa_mode", params.antialiasing_method.value)

    from ..pipeline.gradient import stops_table_or_empty

    ramps_arr = stops_table_or_empty(ramps)
    atlas = build_image_atlas(images)

    # The pipeline intentionally computes garbage in masked-off lanes
    # (dead work items, capacity padding); silence numpy's warnings for
    # those lanes — results are always masked before use.
    with np.errstate(all="ignore"):
        for _ in range(max_retries):
            fine_out, flags = render_mod.render_frame(
                np, scene_u32, ld, ramps_arr, atlas, caps
            )
            if not any(bool(v) for v in flags.values()):
                break
            caps = grow_caps(caps, flags)
        img = assemble_image(np, fine_out, ld)
    return np.asarray(img), flags, caps
