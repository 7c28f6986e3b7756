"""Locate WHICH tiles the geometry-sharded pipeline gets wrong at n=8."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

import jello_tpu as jt
from jello_tpu.cpu.pipeline import build_image_atlas, build_layout_dict
from jello_tpu.cpu.pipeline import render as render_numpy_fn
from jello_tpu.pipeline.fine_ref import assemble_image
from jello_tpu.pipeline.gradient import stops_table_or_empty
from jello_tpu.pipeline.render import pack_layout
from jello_tpu.renderer.estimate import estimate_caps
from jello_tpu.renderer.params import RenderParams
from jello_tpu.renderer.resolve import Resolver
from jello_tpu.tpu import sharded2 as s2
from tools.debug_sharded2 import build_scene

n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
devices = np.array(jax.devices()[:n])
mesh = Mesh(devices, (s2.AXIS,))

scene = build_scene()
W = H = 128
params = RenderParams(width=W, height=H, base_color=jt.Color.rgba(1, 1, 1, 1))
layout, ramps, images, scene_u32 = Resolver().resolve(scene.encoding)
ld_np = build_layout_dict(layout, params)
caps = estimate_caps(layout, params.width, params.height)

nsc = 1 << (len(scene_u32) - 1).bit_length()
scene_padded = np.zeros(max(nsc, 1024), dtype=np.uint32)
scene_padded[: len(scene_u32)] = scene_u32
ramps_arr = stops_table_or_empty(ramps)
atlas = build_image_atlas(images)

run = s2.make_sharded_render(mesh, caps, interpret=True)
out, flags = run(
    jnp.asarray(scene_padded), jnp.asarray(pack_layout(ld_np)),
    jnp.asarray(ramps_arr), None if atlas is None else jnp.asarray(atlas),
)
out = np.asarray(out)
img = assemble_image(np, out, ld_np)
ref, _, _ = render_numpy_fn(scene, params, caps=dict(caps))
err = np.abs(np.asarray(img) - ref).max()
print("n =", n, "err =", err)

# Per-tile (16x16) max error map.
wt = (W + 15) // 16
ht = (H + 15) // 16
em = np.zeros((ht, wt))
for ty in range(ht):
    for tx in range(wt):
        em[ty, tx] = np.abs(
            img[ty * 16 : (ty + 1) * 16, tx * 16 : (tx + 1) * 16]
            - ref[ty * 16 : (ty + 1) * 16, tx * 16 : (tx + 1) * 16]
        ).max()
np.set_printoptions(precision=2, linewidth=160, suppress=True)
print("tile err map (rows = ty):")
print(em)
GRID = caps["tile_grid_cap"]
local = GRID // n
print("GRID", GRID, "local_tiles", local, "width_in_tiles", ld_np["width_in_tiles"])
