import time, jax, jax.numpy as jnp
from mort_tpu.scene import scenes as sc
from mort_tpu.render.wavefront import render_wavefront
world, cam = sc.random_spheres()
data, meta = world.compile()
img = render_wavefront(data, meta, cam)  # compile+run
jax.block_until_ready(img)
s = render_wavefront.last_stats
print("stats:", s)
print("occupancy:", s["useful_segments"]/s["slots_executed"])
spp = cam.sqrt_spp**2
print("paths:", cam.image_width*cam.image_height*spp/1e6, "M")
print("segments/path:", s["useful_segments"]/(cam.image_width*cam.image_height*spp))
