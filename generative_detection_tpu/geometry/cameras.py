"""Patch-perspective camera math in pure JAX.

TPU-native rebuild of ``src/util/cameras.py`` (PatchPerspectiveCameras over
pytorch3d ``PerspectiveCameras``): a *screen-space* pinhole camera plus the
affine NDC -> patch-NDC transform used to express object centroids in
patch-local coordinates, and the z world<->patch<->learned remappings.

Conventions (pytorch3d-compatible, verified by golden tests):
- row-vector transforms: ``p' = [p, 1] @ M`` (see ``transforms.Transform``);
- projection (screen units): ``x' = fx*x/z + px``, ``y' = fy*y/z + py``,
  ``z' = 1/z``;
- screen->NDC (no xyflip): ``x_ndc = (x_screen - W/2) / s``,
  ``y_ndc = (y_screen - H/2) / s`` with ``s = min(H, W)/2``; z unchanged;
- NDC->screen with xyflip applies the flip *before* the affine:
  ``x_screen = W/2 - s * x_ndc``;
- NDC->patch-NDC (ref cameras.py:204-319):
  ``x_patch = (min(patch)/min(image)) * (x_ndc - cx_ndc)`` where ``cx_ndc``
  is the patch center pushed through screen->NDC; z unchanged.

All ops are jnp and vmappable; the data pipeline calls them per-sample on
host, eval batches them on device.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax.numpy as jnp
from flax import struct

from .transforms import Transform, robust_inverse

ArrayLike = Union[jnp.ndarray, Sequence, float]


def _as_batched(x: ArrayLike, last_dim: Optional[int]) -> jnp.ndarray:
    a = jnp.asarray(x, dtype=jnp.float32)
    if last_dim is None:
        if a.ndim == 0:
            a = a[None]
    else:
        a = a.reshape(-1, last_dim)
    return a


@struct.dataclass
class PatchPerspectiveCameras:
    """Screen-space perspective camera (R/T optional; identity by default).

    Ref: src/util/cameras.py:21-79 — the reference asserts ``in_ndc=False``
    (screen-space parameters only); the dataset builds it with a *negated*
    focal length (ref nuscenes.py:397-406).
    """

    focal_length: jnp.ndarray  # (N,) or (N, 2)
    principal_point: jnp.ndarray  # (N, 2)
    image_size: jnp.ndarray  # (N, 2) as (H, W)
    R: jnp.ndarray  # (N, 3, 3)
    T: jnp.ndarray  # (N, 3)
    znear: float = struct.field(pytree_node=False, default=0.0)
    zfar: float = struct.field(pytree_node=False, default=80.0)

    @classmethod
    def create(
        cls,
        focal_length: ArrayLike,
        principal_point: ArrayLike,
        image_size: ArrayLike,
        R: Optional[ArrayLike] = None,
        T: Optional[ArrayLike] = None,
        znear: float = 0.0,
        zfar: float = 80.0,
    ) -> "PatchPerspectiveCameras":
        f = jnp.asarray(focal_length, dtype=jnp.float32)
        if f.ndim == 0:
            f = f[None]
        pp = _as_batched(principal_point, 2)
        im = _as_batched(image_size, 2)
        n = max(f.shape[0], pp.shape[0], im.shape[0])
        if R is None:
            R_ = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (n, 3, 3))
        else:
            R_ = jnp.asarray(R, dtype=jnp.float32).reshape(-1, 3, 3)
        if T is None:
            T_ = jnp.zeros((n, 3), dtype=jnp.float32)
        else:
            T_ = jnp.asarray(T, dtype=jnp.float32).reshape(-1, 3)
        return cls(
            focal_length=f,
            principal_point=pp,
            image_size=im,
            R=R_,
            T=T_,
            znear=znear,
            zfar=zfar,
        )

    # -- basic accessors ---------------------------------------------------
    @property
    def batch(self) -> int:
        return self.principal_point.shape[0]

    def _fx_fy(self):
        f = self.focal_length
        if f.ndim == 1:
            return f, f
        return f[..., 0], f[..., 1]

    def get_principal_point(self) -> jnp.ndarray:
        return self.principal_point

    def get_image_size(self) -> jnp.ndarray:
        return self.image_size

    # -- transforms ----------------------------------------------------------
    def get_world_to_view_transform(self) -> Transform:
        n = self.batch
        M = jnp.zeros((n, 4, 4), dtype=jnp.float32)
        M = M.at[:, :3, :3].set(self.R)
        M = M.at[:, 3, :3].set(self.T)
        M = M.at[:, 3, 3].set(1.0)
        return Transform(matrix=M)

    def get_projection_transform(self) -> Transform:
        """Perspective projection in screen units: row-vector K with
        ``[x,y,z,1] @ K -> (fx x + px z, fy y + py z, 1, z)`` then w-divide."""
        n = self.batch
        fx, fy = self._fx_fy()
        px, py = self.principal_point[..., 0], self.principal_point[..., 1]
        M = jnp.zeros((n, 4, 4), dtype=jnp.float32)
        M = M.at[:, 0, 0].set(fx)
        M = M.at[:, 1, 1].set(fy)
        M = M.at[:, 2, 0].set(px)
        M = M.at[:, 2, 1].set(py)
        M = M.at[:, 3, 2].set(1.0)
        M = M.at[:, 2, 3].set(1.0)
        return Transform(matrix=M)

    def get_full_projection_transform(self) -> Transform:
        return self.get_world_to_view_transform().compose(self.get_projection_transform())

    def _ndc_to_screen_matrix(self, with_xyflip: bool) -> jnp.ndarray:
        n = self.batch
        h, w = self.image_size[..., 0], self.image_size[..., 1]
        s = jnp.minimum(h, w) / 2.0
        M = jnp.zeros((n, 4, 4), dtype=jnp.float32)
        M = M.at[:, 0, 0].set(s)
        M = M.at[:, 1, 1].set(s)
        M = M.at[:, 3, 0].set(w / 2.0)
        M = M.at[:, 3, 1].set(h / 2.0)
        M = M.at[:, 2, 2].set(1.0)
        M = M.at[:, 3, 3].set(1.0)
        if with_xyflip:
            flip = jnp.diag(jnp.asarray([-1.0, -1.0, 1.0, 1.0], dtype=jnp.float32))
            M = jnp.einsum("ij,njk->nik", flip, M)  # flip applied first
        return M

    def get_ndc_camera_transform(self) -> Transform:
        """screen -> NDC, no xyflip (pytorch3d ``get_ndc_camera_transform``
        for screen-space cameras)."""
        return Transform(matrix=jnp.linalg.inv(self._ndc_to_screen_matrix(False)))

    def transform_points_ndc(self, points: ArrayLike, eps: Optional[float] = None) -> jnp.ndarray:
        world_to_ndc = self.get_full_projection_transform().compose(
            self.get_ndc_camera_transform()
        )
        return world_to_ndc.transform_points(jnp.asarray(points, jnp.float32), eps=eps)

    def transform_points_screen(
        self, points: ArrayLike, eps: Optional[float] = None, with_xyflip: bool = True
    ) -> jnp.ndarray:
        pts_ndc = self.transform_points_ndc(points, eps=eps)
        ndc_to_screen = Transform(matrix=self._ndc_to_screen_matrix(with_xyflip))
        return ndc_to_screen.transform_points(pts_ndc, eps=eps)

    # -- patch NDC (ref: src/util/cameras.py:81-157) -------------------------
    def get_patch_ndc_camera_transform(
        self, patch_size: ArrayLike, patch_center: ArrayLike
    ) -> Transform:
        return get_ndc_to_patch_ndc_transform(
            self,
            with_xyflip=False,
            image_size=self.image_size,
            patch_size=patch_size,
            patch_center=patch_center,
        )

    def get_patch_projection_transform(
        self, patch_size: ArrayLike, patch_center: ArrayLike
    ) -> Transform:
        world_to_ndc = self.get_full_projection_transform().compose(
            self.get_ndc_camera_transform()
        )
        return world_to_ndc.compose(
            self.get_patch_ndc_camera_transform(patch_size, patch_center)
        )

    def transform_points_patch_ndc(
        self,
        points: ArrayLike,
        patch_size: ArrayLike,
        patch_center: ArrayLike,
        eps: Optional[float] = None,
    ) -> jnp.ndarray:
        """camera/world points -> patch NDC (ref cameras.py:110-131):
        project to screen (with xyflip), screen->NDC, then NDC->patch NDC."""
        points_screen = self.transform_points_screen(points, eps=eps)
        points_ndc = self.get_ndc_camera_transform().transform_points(points_screen)
        ndc_to_patch = self.get_patch_ndc_camera_transform(patch_size, patch_center)
        return ndc_to_patch.transform_points(points_ndc, eps=1e-7)

    def transform_points_world_from_patch_ndc(
        self,
        points: ArrayLike,
        patch_size: ArrayLike,
        patch_center: ArrayLike,
        eps: Optional[float] = None,
    ) -> jnp.ndarray:
        """patch-NDC points -> world (ref cameras.py:97-108). NOTE: inverts
        the *composed* world->patch-NDC matrix, exactly like the reference
        (which therefore inverts through the projective w-divide as a plain
        matrix inverse)."""
        world_to_patch = self.get_patch_projection_transform(patch_size, patch_center)
        patch_to_world = robust_inverse(world_to_patch)
        return patch_to_world.transform_points(jnp.asarray(points, jnp.float32), eps=eps)


def get_ndc_to_patch_ndc_transform(
    cameras: PatchPerspectiveCameras,
    with_xyflip: bool = False,
    image_size: Optional[ArrayLike] = None,
    patch_size: Optional[ArrayLike] = None,
    patch_center: Optional[ArrayLike] = None,
) -> Transform:
    """NDC -> patch NDC affine (ref: src/util/cameras.py:204-319).

    ``x_patch = (min(patch)/min(image)) * (x_ndc - cx_ndc)`` where
    (cx_ndc, cy_ndc) is the patch center mapped screen->NDC. NOTE the
    reference divides by the *full* min image size here (not the half-size
    used by screen->NDC) — replicated faithfully.
    """
    if image_size is None or patch_size is None or patch_center is None:
        raise ValueError("image_size, patch_size and patch_center are required")
    image_size = _as_batched(image_size, 2)
    patch_size = _as_batched(patch_size, 2)
    patch_center = _as_batched(patch_center, 2)
    n = cameras.batch

    cx_screen = patch_center[..., 0]
    cy_screen = patch_center[..., 1]
    point_screen = jnp.stack(
        [cx_screen, cy_screen, jnp.ones_like(cx_screen)], axis=-1
    )[:, None, :]  # (N, 1, 3)
    point_ndc = cameras.get_ndc_camera_transform().transform_points(point_screen)[:, 0, :]
    cx_ndc = point_ndc[..., 0]
    cy_ndc = point_ndc[..., 1]

    scale = jnp.min(image_size, axis=1)  # full min image dim (ref :290)
    patch_scale = jnp.min(patch_size, axis=-1)  # min patch dim (ref :291)
    ratio = patch_scale / scale

    K = jnp.zeros((n, 4, 4), dtype=jnp.float32)
    K = K.at[:, 0, 0].set(ratio)
    K = K.at[:, 1, 1].set(ratio)
    K = K.at[:, 3, 0].set(-ratio * cx_ndc)
    K = K.at[:, 3, 1].set(-ratio * cy_ndc)
    K = K.at[:, 2, 2].set(1.0)
    K = K.at[:, 3, 3].set(1.0)
    transform = Transform(matrix=K)
    if with_xyflip:
        flip = jnp.diag(jnp.asarray([-1.0, -1.0, 1.0, 1.0], dtype=jnp.float32))
        transform = transform.compose(Transform(matrix=jnp.broadcast_to(flip, (n, 4, 4))))
    return transform


def get_patch_ndc_to_ndc_transform(
    cameras: PatchPerspectiveCameras,
    with_xyflip: bool = False,
    image_size: Optional[ArrayLike] = None,
    patch_size: Optional[ArrayLike] = None,
    patch_center: Optional[ArrayLike] = None,
) -> Transform:
    """patch NDC -> NDC (ref: src/util/cameras.py:163-202)."""
    return robust_inverse(
        get_ndc_to_patch_ndc_transform(
            cameras,
            with_xyflip=with_xyflip,
            image_size=image_size,
            patch_size=patch_size,
            patch_center=patch_center,
        )
    )


# -- z remappings (ref: src/util/cameras.py:321-345) -------------------------

def z_patch_to_world(z_patch, patch_resampling_factor):
    return z_patch * patch_resampling_factor


def z_world_to_patch(z_world, patch_resampling_factor):
    return z_world / patch_resampling_factor


def z_patch_to_learned(z_patch, zmin, zmax):
    return 2.0 * ((z_patch - zmin) / (zmax - zmin)) - 1.0


def z_learned_to_patch(z_learned, zmin, zmax):
    return 0.5 * (z_learned + 1.0) * (zmax - zmin) + zmin


def z_world_to_learned(z_world, zmin, zmax, patch_resampling_factor):
    return z_patch_to_learned(z_world_to_patch(z_world, patch_resampling_factor), zmin, zmax)


def z_learned_to_world(z_learned, zmin, zmax, patch_resampling_factor):
    return z_patch_to_world(z_learned_to_patch(z_learned, zmin, zmax), patch_resampling_factor)
