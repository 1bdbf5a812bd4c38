import numpy as np, jax, jax.numpy as jnp
from nerffaceediting_tpu.config import ffhq_generator_config
from nerffaceediting_tpu.models import triplane
from nerffaceediting_tpu.render.cameras import camera_params, fov_to_intrinsics, lookat_pose
from nerffaceediting_tpu.apps.gen_samples import to_uint8_image, save_png
cfg = ffhq_generator_config()
params = triplane.init_generator(jax.random.key(0), cfg)
z = jax.random.normal(jax.random.key(1), (1, cfg.z_dim))
cam = camera_params(lookat_pose(np.pi/2, np.pi/2, (0,0,0.2), radius=2.7), fov_to_intrinsics(18.837))
img = np.asarray(jax.jit(lambda p, z, c: triplane.generate(p, z, c, cfg)["image"])(params, z, cam))
np.save("/tmp/img_tpu.npy", img)
cpu = np.load("/tmp/img_cpu.npy")
diff = np.abs(cpu - img)
print(f"max abs {diff.max():.5f} mean abs {diff.mean():.6f} range {cpu.max()-cpu.min():.3f}")
import os; os.makedirs("/root/repo/debug", exist_ok=True)
save_png("/root/repo/debug/sample_tpu.png", to_uint8_image(jnp.asarray(img))[0])
save_png("/root/repo/debug/sample_cpu.png", to_uint8_image(jnp.asarray(cpu))[0])
u8 = np.abs(to_uint8_image(jnp.asarray(img)).astype(int) - to_uint8_image(jnp.asarray(cpu)).astype(int))
print(f"uint8: max {u8.max()} mean {u8.mean():.4f}")
