"""Static configuration structs.

The reference carries a mutable ``rendering_kwargs`` dict inside the generator
(ref: training/triplane.py:53, train.py:288-313). Here the equivalent is a
frozen, hashable dataclass so it can be closed over by ``jax.jit`` as static
config; changing it re-triggers compilation, which is the TPU-correct
behaviour (each knob combination is its own device program).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class RenderingConfig:
    """Volume-rendering options (ref: train.py:288-313 `rendering_options`)."""

    image_resolution: int = 512
    # Two-pass hierarchical sampling (ref: train.py:306-307).
    depth_resolution: int = 48
    depth_resolution_importance: int = 48
    # Ray bounds; 'auto' (ray-box intersection) is selected with ray_start=None.
    ray_start: Optional[float] = 2.25
    ray_end: Optional[float] = 3.3
    box_warp: float = 1.0
    disparity_space_sampling: bool = False
    clamp_mode: str = "softplus"
    white_back: bool = False
    density_noise: float = 0.0
    # Generator pose conditioning (ref: triplane.py:69-72).
    c_gen_conditioning_zero: bool = False
    c_scale: float = 1.0
    # Superresolution.
    superresolution_module: str = "SuperresolutionHybrid8XDC"
    superresolution_noise_mode: str = "none"
    sr_antialias: bool = True
    # Decoder.
    decoder_lr_mul: float = 1.0
    decoder_output_dim: int = 32
    decoder_seg_dim: int = 15
    # Density regularization (training only; ref: train.py:297-299).
    density_reg: float = 0.25
    density_reg_p_dist: float = 0.004
    reg_type: str = "l1"
    # Visualizer-only camera defaults (ref: train.py:311-312).
    avg_camera_radius: float = 2.7
    avg_camera_pivot: Tuple[float, float, float] = (0.0, 0.0, 0.2)

    @property
    def ray_auto(self) -> bool:
        return self.ray_start is None or self.ray_end is None


@dataclasses.dataclass(frozen=True)
class GeneratorConfig:
    """TriPlaneGenerator hyperparameters (ref: training/triplane.py:19-53,
    train.py:225-245 config assembly)."""

    z_dim: int = 512
    c_dim: int = 25
    w_dim: int = 512
    img_resolution: int = 512
    img_channels: int = 3
    # StyleGAN2 backbone emitting the 3×32-channel tri-plane at 256²
    # (ref: triplane.py:46).
    backbone_resolution: int = 256
    plane_channels: int = 32
    num_planes: int = 3
    channel_base: int = 32768
    channel_max: int = 512
    mapping_layers: int = 2  # ref: train.py:154 (--map-depth default 2)
    mapping_lr_multiplier: float = 0.01
    w_avg_beta: float = 0.998
    neural_rendering_resolution: int = 64  # ref: triplane.py:52
    # Ablation switches (ref: triplane.py:30-31).
    disable_disentangle: bool = False
    disable_alignment: bool = False
    rendering: RenderingConfig = dataclasses.field(default_factory=RenderingConfig)

    @property
    def backbone_img_channels(self) -> int:
        return self.num_planes * self.plane_channels  # 96

    @property
    def decoder_hidden_dim(self) -> int:
        return 64  # ref: triplane.py:235


@dataclasses.dataclass(frozen=True)
class DiscriminatorConfig:
    """DualDiscriminator hyperparameters (ref: training/dual_discriminator.py:107-133)."""

    c_dim: int = 25
    img_resolution: int = 512
    img_channels: int = 3  # doubled internally for the dual (SR + raw) input
    channel_base: int = 32768
    channel_max: int = 512
    conv_clamp: Optional[float] = 256.0
    cmap_dim: Optional[int] = None
    disc_c_noise: float = 0.0
    mbstd_group_size: int = 4
    mbstd_num_channels: int = 1
    # Freeze-D transfer learning: freeze the first N conv layers counted
    # from the top resolution (ref networks_stylegan2.py:585-592, --freezed).
    freezed: int = 0


def ffhq_rendering_config(**overrides) -> RenderingConfig:
    """The ffhq config block (ref: train.py:305-313)."""
    base = dict(
        image_resolution=512,
        depth_resolution=48,
        depth_resolution_importance=48,
        ray_start=2.25,
        ray_end=3.3,
        box_warp=1.0,
        avg_camera_radius=2.7,
        avg_camera_pivot=(0.0, 0.0, 0.2),
    )
    base.update(overrides)
    return RenderingConfig(**base)


def ffhq_generator_config(**overrides) -> GeneratorConfig:
    rendering = overrides.pop("rendering", ffhq_rendering_config())
    return GeneratorConfig(rendering=rendering, **overrides)
