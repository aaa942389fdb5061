"""LPIPS perceptual loss (VGG16 features + learned linear heads) in flax.

Rebuild of taming-transformers' LPIPS as used by the reference loss base
(``self.perceptual_loss(inputs, recons)`` -> per-sample (B,1,1,1) map added to
|x - x_hat|, ref contperceptual.py:141-145). Architecture:

- ScalingLayer: ImageNet-stat shift/scale of [-1,1] inputs;
- VGG16 conv features with taps after relu1_2/relu2_2/relu3_3/relu4_3/relu5_3;
- per-tap channel-L2 normalization, squared difference, 1x1 no-bias linear
  head, spatial mean, summed over taps.

Pretrained weights: this build environment has no network egress and no
torchvision weight cache, so by default the module uses a *deterministic
seeded* initialization (random VGG features are a known-usable perceptual
metric family). Exact-parity weights can be injected by converting the
public ``vgg16`` + taming ``vgg.pth`` checkpoints with
``tools/convert_lpips.py`` and passing ``weights_path`` (a .npz) — the
parameter tree layout is identical.
"""

from __future__ import annotations

import hashlib
import os
from typing import Any, Sequence

import numpy as np
import jax.numpy as jnp
from flax import linen as nn

# VGG16 conv plan: channels per conv, 'M' = 2x2 maxpool.
_VGG16_PLAN = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512)
# Tap indices counted in convs: relu1_2=conv2, relu2_2=conv4, relu3_3=conv7,
# relu4_3=conv10, relu5_3=conv13 (1-based conv count).
_TAP_AFTER_CONV = (2, 4, 7, 10, 13)
_TAP_CHANNELS = (64, 128, 256, 512, 512)

_SHIFT = np.array([-0.030, -0.088, -0.188], dtype=np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], dtype=np.float32)


def _normalize_tensor(x: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    return x / (norm + eps)


def _tap_distance(a: jnp.ndarray, b: jnp.ndarray, kernel: jnp.ndarray,
                  eps: float = 1e-10) -> jnp.ndarray:
    """mean_HW sum_c w_c (a_hat - b_hat)_c^2 without materializing the
    normalized tensors.

    The naive form (normalize -> diff -> square -> 1x1 conv) costs two full
    passes over each tap in the forward (channel-norm reduce + apply) and
    more in the backward — the 8.3 ms ``multiply_reduce`` tail in the
    round-3 step profile (docs/BENCH.md). Expanding the square,

        sum_c w_c (a/na - b/nb)^2
          = (sum w a^2)/na^2 + (sum w b^2)/nb^2 - 2 (sum w a b)/(na nb),

    with na = ||a|| + eps (the reference ``x/(norm+eps)`` semantics), needs
    only five sibling channel reductions over raw a, b — XLA fuses them into
    ONE read of each tap, and the backward re-reads each tap once.

    Two deliberate refinements over a literal ``sqrt(a2) + eps``:

    - safe-sqrt ``where``: the ``a2 == 0`` branch routes around the sqrt so
      its gradient is cut instead of ``sqrt'(0) = inf`` — the reference form
      (torch and the naive jnp port alike) emits NaN gradients at pixels
      where a ReLU tap is all-zero across channels, a real training hazard
      (pinned by test). Values agree with the reference there (every
      numerator is zero).
    - a 3e-9 norm floor: the EXPANDED backward carries ``1/na^4`` terms the
      reference's factored form never builds; at ``na ~ 1e-10`` they reach
      1e40 and overflow f32 to inf. ``na >= 3e-9`` caps them at ~1.2e34
      (f32 max 3.4e38) and ``jnp.maximum`` cuts the sqrt cotangent below
      the floor. Reference semantics are EXACT for every ``||a|| >= 3e-9``;
      below that a VGG tap is numerically zero (activations are 1e-3..1e2),
      five decades tighter than the 1e-12 variance floor of an earlier
      draft (which misnormalized plausible ``||a|| ~ 1e-6`` taps by ~30%).
    """
    a32 = a.astype(jnp.float32)
    b32 = b.astype(jnp.float32)
    w = kernel.reshape(-1).astype(jnp.float32)  # (C,) from the (1,1,C,1) head
    a2 = jnp.sum(jnp.square(a32), axis=-1)
    b2 = jnp.sum(jnp.square(b32), axis=-1)
    a2w = jnp.sum(jnp.square(a32) * w, axis=-1)
    b2w = jnp.sum(jnp.square(b32) * w, axis=-1)
    abw = jnp.sum(a32 * b32 * w, axis=-1)

    def _safe_norm(x2):
        nz = x2 > 0.0
        raw = jnp.where(nz, jnp.sqrt(jnp.where(nz, x2, 1.0)), 0.0) + eps
        return jnp.maximum(raw, 3e-9)  # backward 1/na^4 overflow guard

    na = _safe_norm(a2)
    nb = _safe_norm(b2)
    val = a2w / jnp.square(na) + b2w / jnp.square(nb) - 2.0 * abw / (na * nb)
    return jnp.mean(val, axis=(1, 2))[:, None, None, None]  # (B,1,1,1)


class _VGG16Features(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Sequence[jnp.ndarray]:
        taps = []
        conv_idx = 0
        h = x.astype(self.dtype)
        for item in _VGG16_PLAN:
            if item == "M":
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
            else:
                conv_idx += 1
                h = nn.Conv(item, (3, 3), padding="SAME", dtype=self.dtype, name=f"conv{conv_idx}")(h)
                h = nn.relu(h)
                if conv_idx in _TAP_AFTER_CONV:
                    taps.append(h)
        return taps


class _LinHead(nn.Module):
    """Parameter-only stand-in for the 1x1 no-bias Conv head: same param
    name ("kernel"), shape (1, 1, C, 1), and default init as nn.Conv, so the
    checkpoint/converter layout and the seeded values are unchanged."""

    in_features: int

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        return self.param(
            "kernel", nn.initializers.lecun_normal(), (1, 1, self.in_features, 1)
        )


class LPIPS(nn.Module):
    """Returns a per-sample perceptual distance map of shape (B, 1, 1, 1)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs: jnp.ndarray, recons: jnp.ndarray) -> jnp.ndarray:
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)
        vgg = _VGG16Features(dtype=self.dtype, name="vgg")

        def prep(x):
            return (x - shift) / scale

        taps_in = vgg(prep(inputs))
        taps_rec = vgg(prep(recons))

        total = 0.0
        for i, (a, b) in enumerate(zip(taps_in, taps_rec)):
            # Same (1,1,C,1) "lin{i}/kernel" param tree as the nn.Conv head
            # (identical name path => identical seeded init and converter
            # layout); applied via the fused expanded-square distance.
            kernel = _LinHead(in_features=a.shape[-1], name=f"lin{i}")()
            total = total + _tap_distance(a, b, kernel)
        return total.astype(jnp.float32)


# The exact key set tools/convert_lpips.py writes: 13 VGG16 convs
# (kernel+bias) + 5 linear heads (kernel only). Anything else is a wrong or
# truncated file and must fail loudly, not train silently random.
EXPECTED_NPZ_KEYS = frozenset(
    [f"vgg/conv{i}/{p}" for i in range(1, 14) for p in ("kernel", "bias")]
    + [f"lin{i}/kernel" for i in range(5)]
)


def load_lpips_weights(
    params: dict, weights_path: str, expected_sha256: str | None = None
) -> dict:
    """Overlay converted pretrained weights (.npz from tools/convert_lpips.py)
    onto an initialized LPIPS parameter tree.

    Validates before merging (pretrained perceptual weights are the one
    still-outstanding parity artifact — ref contperceptual.py:143-145 — so a
    future weight file must be a config change that either works byte-exactly
    or fails with an actionable error):
    - optional ``expected_sha256`` (or a ``<weights_path>.sha256`` sidecar
      file): content checksum of the npz;
    - the key set must equal the converter layout exactly;
    - every array's shape must match the initialized parameter it replaces.
    """
    import flax

    if expected_sha256 is None:
        sidecar = weights_path + ".sha256"
        if os.path.exists(sidecar):
            with open(sidecar) as f:
                expected_sha256 = f.read().split()[0].strip()
    if expected_sha256:
        h = hashlib.sha256()
        with open(weights_path, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
        got = h.hexdigest()
        if got != expected_sha256.lower():
            raise ValueError(
                f"LPIPS weights checksum mismatch for {weights_path}: "
                f"expected {expected_sha256}, got {got}. Re-run "
                "tools/convert_lpips.py or fix the recorded checksum."
            )

    flat = dict(np.load(weights_path))
    keys = frozenset(flat)
    if keys != EXPECTED_NPZ_KEYS:
        missing = sorted(EXPECTED_NPZ_KEYS - keys)
        extra = sorted(keys - EXPECTED_NPZ_KEYS)
        raise ValueError(
            f"LPIPS npz {weights_path} does not match the converter layout: "
            f"missing={missing[:5]}{'...' if len(missing) > 5 else ''} "
            f"extra={extra[:5]}{'...' if len(extra) > 5 else ''} "
            "(expected the exact tools/convert_lpips.py key set)"
        )

    merged = flax.core.unfreeze(params)
    flat_params = flax.traverse_util.flatten_dict(merged)
    for k, v in flat.items():
        path = tuple(k.split("/"))
        if path not in flat_params:
            raise ValueError(
                f"LPIPS npz key {k!r} has no matching initialized parameter "
                f"(module layout changed?)"
            )
        want_shape = tuple(flat_params[path].shape)
        if tuple(v.shape) != want_shape:
            raise ValueError(
                f"LPIPS npz {k!r} shape {tuple(v.shape)} != parameter shape "
                f"{want_shape}"
            )
    tree = flax.traverse_util.unflatten_dict(
        {tuple(k.split("/")): jnp.asarray(v) for k, v in flat.items()}
    )
    merged.update(tree)
    return merged
