import os
os.environ["XLA_FLAGS"]=""
import jax; jax.config.update("jax_platforms","cpu")
import numpy as np, jax.numpy as jnp
from nerffaceediting_tpu.config import ffhq_generator_config
from nerffaceediting_tpu.models import triplane
from nerffaceediting_tpu.render.cameras import camera_params, fov_to_intrinsics, lookat_pose
cfg = ffhq_generator_config()
params = triplane.init_generator(jax.random.key(0), cfg)
z = jax.random.normal(jax.random.key(1), (1, cfg.z_dim))
cam = camera_params(lookat_pose(np.pi/2, np.pi/2, (0,0,0.2), radius=2.7), fov_to_intrinsics(18.837))
img = np.asarray(jax.jit(lambda p, z, c: triplane.generate(p, z, c, cfg)["image"])(params, z, cam))
np.save("/tmp/img_cpu.npy", img)
print("cpu done")
