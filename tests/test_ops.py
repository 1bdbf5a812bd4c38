"""Golden tests for the ops layer against torch CPU oracles.

Each custom op in the reference ships a pure-torch reference implementation
that serves as the CUDA kernel's oracle (ref: torch_utils/ops/upfirdn2d.py:169,
bias_act.py:93, SURVEY.md §4). Here the oracle role is played by torch
functional ops evaluated on CPU; our JAX ops must match them numerically.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from nerffaceediting_tpu.ops import (
    bias_act,
    setup_filter,
    upfirdn2d,
    upsample2d,
    downsample2d,
    filter2d,
    grid_sample_2d,
    resize_bilinear,
    modulated_conv2d,
    conv2d_resample,
)


def torch_upfirdn2d(x, f, up=1, down=1, padding=0, flip_filter=False, gain=1.0):
    """Oracle reproducing upfirdn2d semantics with plain torch ops
    (independent implementation of the documented op contract)."""
    x = torch.as_tensor(np.asarray(x), dtype=torch.float64)
    if f is None:
        f = torch.ones(1, 1, dtype=torch.float64)
    else:
        f = torch.as_tensor(np.asarray(f), dtype=torch.float64)
    if isinstance(up, int):
        up = (up, up)
    if isinstance(down, int):
        down = (down, down)
    if isinstance(padding, int):
        padding = (padding, padding, padding, padding)
    elif len(padding) == 2:
        padding = (padding[0], padding[0], padding[1], padding[1])
    px0, px1, py0, py1 = padding
    upx, upy = up
    downx, downy = down
    B, C, H, W = x.shape

    # 1. zero-insert upsample
    y = torch.zeros(B, C, H * upy, W * upx, dtype=x.dtype)
    y[:, :, ::upy, ::upx] = x
    # 2. pad / crop
    y = F.pad(y, (max(px0, 0), max(px1, 0), max(py0, 0), max(py1, 0)))
    y = y[
        :,
        :,
        max(-py0, 0) : y.shape[2] - max(-py1, 0),
        max(-px0, 0) : y.shape[3] - max(-px1, 0),
    ]
    # 3. FIR filter (convolution unless flip_filter, then correlation)
    f = f * (gain ** (f.dim() / 2))
    if f.dim() == 1:
        f2 = torch.outer(f, f)
        gain_fix = 1.0  # separable path applies gain^0.5 per axis == gain total
    else:
        f2 = f
        gain_fix = 1.0
    k = f2 if flip_filter else f2.flip(0, 1)
    k = k[None, None].repeat(C, 1, 1, 1)
    y = F.conv2d(y, k, groups=C)
    # 4. downsample
    y = y[:, :, ::downy, ::downx]
    return (y * gain_fix).numpy()


class TestBiasAct:
    @pytest.mark.parametrize("act", ["linear", "relu", "lrelu", "tanh", "sigmoid", "softplus", "swish", "elu", "selu"])
    def test_matches_torch(self, act):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(4, 16, 8, 8)).astype(np.float32)
        b = rng.normal(size=(16,)).astype(np.float32)
        out = np.asarray(bias_act(jnp.asarray(x), jnp.asarray(b), act=act))

        xt = torch.tensor(x) + torch.tensor(b).reshape(1, -1, 1, 1)
        table = {
            "linear": lambda t: t,
            "relu": lambda t: F.relu(t) * np.sqrt(2),
            "lrelu": lambda t: F.leaky_relu(t, 0.2) * np.sqrt(2),
            "tanh": torch.tanh,
            "sigmoid": torch.sigmoid,
            "softplus": F.softplus,
            "swish": lambda t: torch.sigmoid(t) * t * np.sqrt(2),
            "elu": F.elu,
            "selu": F.selu,
        }
        expected = table[act](xt).numpy()
        # XLA's tanh/sigmoid use polynomial approximations; allow a few ULPs.
        np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-4)

    def test_gain_and_clamp(self):
        x = jnp.asarray(np.linspace(-5, 5, 64, dtype=np.float32).reshape(1, 64))
        out = np.asarray(bias_act(x, None, act="linear", gain=3.0, clamp=2.0)).reshape(-1)
        expected = np.clip(np.linspace(-5, 5, 64) * 3.0, -2.0, 2.0)
        np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-6)


class TestUpfirdn2d:
    @pytest.mark.parametrize(
        "up,down,padding",
        [
            (1, 1, 0),
            (1, 1, 2),
            (2, 1, 1),
            (1, 2, 1),
            (2, 2, 3),
            (2, 1, (2, 1, 2, 1)),
            (1, 1, -1),  # negative padding = cropping
        ],
    )
    @pytest.mark.parametrize("separable", [True, False])
    def test_matches_oracle(self, up, down, padding, separable):
        rng = np.random.default_rng(1)
        x = rng.normal(size=(2, 3, 12, 12)).astype(np.float32)
        taps = np.asarray([1.0, 3.0, 3.0, 1.0], np.float32)
        taps = taps / taps.sum()
        if separable:
            f_jax = jnp.asarray(taps)
            f_torch = taps
        else:
            f_jax = jnp.asarray(np.outer(taps, taps))
            f_torch = np.outer(taps, taps)

        out = np.asarray(upfirdn2d(jnp.asarray(x), f_jax, up=up, down=down, padding=padding, gain=2.0))
        expected = torch_upfirdn2d(x, f_torch, up=up, down=down, padding=padding, gain=2.0)
        np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)

    def test_setup_filter_default(self):
        # [1,3,3,1] has fewer than 8 taps, so setup_filter stores it as the
        # dense 4×4 outer product (ref upfirdn2d.py:89-91).
        f = setup_filter([1, 3, 3, 1])
        assert f.ndim == 2 and f.shape == (4, 4)
        np.testing.assert_allclose(np.asarray(f).sum(), 1.0, rtol=1e-6)
        f1 = setup_filter([1, 3, 3, 1], separable=True)
        assert f1.ndim == 1

    def test_upsample_downsample_roundtrip_shapes(self):
        f = setup_filter([1, 3, 3, 1])
        x = jnp.asarray(np.random.default_rng(2).normal(size=(1, 4, 16, 16)).astype(np.float32))
        up = upsample2d(x, f)
        assert up.shape == (1, 4, 32, 32)
        down = downsample2d(up, f)
        assert down.shape == (1, 4, 16, 16)
        same = filter2d(x, f)
        assert same.shape == x.shape

    def test_upsample2d_dc_gain(self):
        # A constant image must stay (approximately) constant under the
        # normalized filter with gain=up².
        f = setup_filter([1, 3, 3, 1])
        x = jnp.ones((1, 1, 16, 16), jnp.float32)
        up = np.asarray(upsample2d(x, f))
        np.testing.assert_allclose(up[0, 0, 4:-4, 4:-4], 1.0, rtol=1e-5)


class TestGridSample:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_matches_torch_inside(self, seed):
        rng = np.random.default_rng(seed)
        img = rng.normal(size=(2, 8, 16, 16)).astype(np.float32)
        coords = rng.uniform(-0.95, 0.95, size=(2, 100, 2)).astype(np.float32)

        out = np.asarray(grid_sample_2d(jnp.asarray(img), jnp.asarray(coords)))

        grid = torch.tensor(coords).unsqueeze(1)  # (B, 1, M, 2)
        ref = F.grid_sample(
            torch.tensor(img), grid, mode="bilinear", padding_mode="zeros", align_corners=False
        )  # (B, C, 1, M)
        ref = ref.squeeze(2).numpy()
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    def test_matches_torch_out_of_bounds(self):
        rng = np.random.default_rng(3)
        img = rng.normal(size=(1, 4, 8, 8)).astype(np.float32)
        coords = rng.uniform(-1.8, 1.8, size=(1, 200, 2)).astype(np.float32)

        out = np.asarray(grid_sample_2d(jnp.asarray(img), jnp.asarray(coords)))
        grid = torch.tensor(coords).unsqueeze(1)
        ref = F.grid_sample(
            torch.tensor(img), grid, mode="bilinear", padding_mode="zeros", align_corners=False
        ).squeeze(2).numpy()
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    def test_grad_exists(self):
        img = jnp.ones((1, 2, 4, 4), jnp.float32)
        coords = jnp.zeros((1, 10, 2), jnp.float32) + 0.3

        def loss(c):
            return jnp.sum(grid_sample_2d(img, c))

        g = jax.grad(loss)(coords)
        assert g.shape == coords.shape
        assert np.all(np.isfinite(np.asarray(g)))


class TestResize:
    def test_bilinear_upsample_matches_torch(self):
        rng = np.random.default_rng(4)
        x = rng.normal(size=(1, 3, 64, 64)).astype(np.float32)
        out = np.asarray(resize_bilinear(jnp.asarray(x), 128))
        ref = F.interpolate(torch.tensor(x), size=(128, 128), mode="bilinear", align_corners=False).numpy()
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    def test_antialiased_downsample_matches_torch(self):
        rng = np.random.default_rng(5)
        x = rng.normal(size=(1, 3, 64, 64)).astype(np.float32)
        out = np.asarray(resize_bilinear(jnp.asarray(x), 16, antialias=True))
        ref = F.interpolate(
            torch.tensor(x), size=(16, 16), mode="bilinear", align_corners=False, antialias=True
        ).numpy()
        np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)


class TestModulatedConv:
    def _torch_modconv(self, x, weight, styles, demodulate=True, up=1, padding=0, f=None):
        """Oracle: grouped-conv formulation of modulated conv (the reference's
        `fused` path, which is mathematically identical to ours)."""
        xt = torch.tensor(x, dtype=torch.float64)
        wt = torch.tensor(weight, dtype=torch.float64)
        st = torch.tensor(styles, dtype=torch.float64)
        B = xt.shape[0]
        O, I, kh, kw = wt.shape
        w = wt.unsqueeze(0) * st.reshape(B, 1, I, 1, 1)
        if demodulate:
            d = (w.square().sum(dim=(2, 3, 4)) + 1e-8).rsqrt()
            w = w * d.reshape(B, O, 1, 1, 1)
        xg = xt.reshape(1, B * I, *xt.shape[2:])
        wg = w.reshape(B * O, I, kh, kw)
        if up == 1:
            y = F.conv2d(xg, wg, padding=padding, groups=B)
        else:
            raise NotImplementedError
        return y.reshape(B, O, *y.shape[2:]).numpy()

    def test_plain_modconv_matches_grouped_oracle(self):
        rng = np.random.default_rng(6)
        x = rng.normal(size=(3, 8, 16, 16)).astype(np.float32)
        w = rng.normal(size=(12, 8, 3, 3)).astype(np.float32)
        s = rng.normal(size=(3, 8)).astype(np.float32) + 1.0

        out = np.asarray(
            modulated_conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(s), padding=1)
        )
        expected = self._torch_modconv(x, w, s, padding=1)
        np.testing.assert_allclose(out, expected, rtol=1e-3, atol=1e-4)

    def test_no_demodulate(self):
        rng = np.random.default_rng(7)
        x = rng.normal(size=(2, 4, 8, 8)).astype(np.float32)
        w = rng.normal(size=(6, 4, 1, 1)).astype(np.float32)
        s = rng.normal(size=(2, 4)).astype(np.float32)
        out = np.asarray(
            modulated_conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(s), demodulate=False)
        )
        expected = self._torch_modconv(x, w, s, demodulate=False)
        np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)

    def test_conv2d_resample_up2_matches_torch_transpose(self):
        """up=2 conv must equal torch conv_transpose2d + FIR filtering
        (the reference's fast path, conv2d_resample.py:117-133)."""
        rng = np.random.default_rng(8)
        B, I, O, H = 2, 6, 5, 8
        x = rng.normal(size=(B, I, H, H)).astype(np.float32)
        w = rng.normal(size=(O, I, 3, 3)).astype(np.float32)
        taps = np.asarray([1, 3, 3, 1], np.float64)
        taps /= taps.sum()
        f2 = np.outer(taps, taps)

        out = np.asarray(
            conv2d_resample(
                jnp.asarray(x), jnp.asarray(w), f=setup_filter([1, 3, 3, 1]),
                up=2, padding=1, flip_weight=False,
            )
        )

        # Oracle: conv_transpose2d stride 2 (true convolution == flip_weight
        # False), then upfirdn filter with the residual padding and gain 4.
        xt = torch.tensor(x, dtype=torch.float64)
        wt = torch.tensor(w, dtype=torch.float64).transpose(0, 1)
        y = F.conv_transpose2d(xt, wt, stride=2)
        # After transpose conv the ref applies the filter with padding
        # p = [(fw+1)//2 + 1 - k + ..] — replicate via the oracle upfirdn:
        # the net contract: output (B, O, 2H, 2H).
        fw = 4
        px0 = (fw + 2 - 1) // 2 + 1  # base padding adjustment for up=2, user pad 1
        px1 = (fw - 2) // 2 + 1
        px0 -= 2  # kw - 1
        px1 -= 1  # kw - up
        expected = torch_upfirdn2d(
            y.numpy(), f2, padding=(px0, px1, px0, px1), gain=4.0, flip_filter=False
        )
        assert out.shape == expected.shape == (B, O, 2 * H, 2 * H)
        np.testing.assert_allclose(out, expected, rtol=1e-3, atol=1e-4)

    @pytest.mark.parametrize("channels_last", [False, True])
    @pytest.mark.parametrize("pad,kh", [(0, 3), (1, 3), (-1, 4), (2, 1)])
    def test_up2_fused_phase_matches_per_phase(self, pad, kh, channels_last,
                                               monkeypatch):
        """NFE_FUSED_PHASE (single 4·O-channel conv via per-phase kernel
        offsets) must be exact vs the per-phase conv + concat path."""
        from nerffaceediting_tpu.ops import modconv
        rng = np.random.default_rng(17)
        B, I, O, H, W = 2, 5, 7, 9, 11
        x = rng.normal(size=(B, I, H, W)).astype(np.float32)
        xj = jnp.asarray(x.transpose(0, 2, 3, 1) if channels_last else x)
        w = jnp.asarray(rng.normal(size=(O, I, kh, kh)).astype(np.float32))
        f = setup_filter([1, 3, 3, 1])
        kw = dict(flip_weight=True, flip_filter=False, gain=4.0,
                  channels_last=channels_last)
        monkeypatch.setattr(modconv, "_fused_phase", lambda: False)
        a = modconv._up2_subpixel_conv(xj, w, f, pad, pad, pad, pad, **kw)
        monkeypatch.setattr(modconv, "_fused_phase", lambda: True)
        b = modconv._up2_subpixel_conv(xj, w, f, pad, pad, pad, pad, **kw)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)

    def test_conv2d_resample_down2(self):
        """down=2 path: FIR filter then strided conv; oracle is torch."""
        rng = np.random.default_rng(9)
        x = rng.normal(size=(2, 4, 16, 16)).astype(np.float32)
        w = rng.normal(size=(8, 4, 3, 3)).astype(np.float32)
        taps = np.asarray([1, 3, 3, 1], np.float64)
        taps /= taps.sum()
        f2 = np.outer(taps, taps)

        out = np.asarray(
            conv2d_resample(
                jnp.asarray(x), jnp.asarray(w), f=setup_filter([1, 3, 3, 1]),
                down=2, padding=1, flip_weight=True,
            )
        )
        fw = 4
        px0 = 1 + (fw - 2 + 1) // 2
        px1 = 1 + (fw - 2) // 2
        filtered = torch_upfirdn2d(x, f2, padding=(px0, px1, px0, px1))
        expected = F.conv2d(torch.tensor(filtered), torch.tensor(w, dtype=torch.float64), stride=2).numpy()
        assert out.shape == expected.shape == (2, 8, 8, 8)
        np.testing.assert_allclose(out, expected, rtol=1e-3, atol=1e-4)


class TestChannelsLast:
    """NHWC (channels_last) path ≡ NCHW path — the TPU-native SR layout
    (ops/modconv.py, ops/upfirdn.py channels_last=True)."""

    def _nchw(self, *shape, seed=0):
        return jax.random.normal(jax.random.key(seed), shape, jnp.float32)

    @pytest.mark.parametrize("up,down", [(1, 1), (2, 1), (1, 2)])
    def test_upfirdn2d_nhwc(self, up, down):
        from nerffaceediting_tpu.ops import setup_filter, upfirdn2d

        x = self._nchw(2, 5, 16, 16)
        f = setup_filter([1, 3, 3, 1])
        ref = upfirdn2d(x, f, up=up, down=down, padding=2, gain=1.3)
        got = upfirdn2d(x.transpose(0, 2, 3, 1), f, up=up, down=down,
                        padding=2, gain=1.3, channels_last=True)
        np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref,
                                   rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("up", [1, 2])
    def test_modulated_conv2d_nhwc(self, up):
        from nerffaceediting_tpu.ops import modulated_conv2d, setup_filter

        x = self._nchw(2, 8, 16, 16)
        w = self._nchw(12, 8, 3, 3, seed=1)
        styles = jax.random.normal(jax.random.key(2), (2, 8), jnp.float32)
        f = setup_filter([1, 3, 3, 1]) if up > 1 else None
        ref = modulated_conv2d(x, w, styles, up=up, padding=1,
                               resample_filter=f, flip_weight=(up == 1))
        got = modulated_conv2d(x.transpose(0, 2, 3, 1), w, styles, up=up,
                               padding=1, resample_filter=f,
                               flip_weight=(up == 1), channels_last=True)
        np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref,
                                   rtol=2e-5, atol=2e-5)

    def test_superresolution_nhwc(self):
        from nerffaceediting_tpu.models.superresolution import (
            init_superresolution, superresolution)

        params = init_superresolution(jax.random.key(0),
                                      "SuperresolutionHybrid2X")
        rgb = self._nchw(1, 3, 64, 64, seed=3)
        x = self._nchw(1, 32, 64, 64, seed=4)
        ws = jax.random.normal(jax.random.key(5), (1, 14, 512), jnp.float32)
        ref = superresolution(params, rgb, x, ws,
                              variant="SuperresolutionHybrid2X",
                              noise_mode="const")
        got = superresolution(params, rgb.transpose(0, 2, 3, 1),
                              x.transpose(0, 2, 3, 1), ws,
                              variant="SuperresolutionHybrid2X",
                              noise_mode="const", channels_last=True)
        np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref,
                                   rtol=2e-4, atol=2e-4)
