"""Camera model.

Reproduces the reference's camera math exactly:

* view matrix ``V = R_w2c @ translate(-C)`` so ``x_view = R (x - C)``
  (reference: src/camera/camera.ts:23-26 — ``mat4.translate(rotation, -pos)``).
* a custom projection with a Y flip and z mapped to [0, 1], znear=0.01,
  zfar=100 (src/camera/camera.ts:29-56, 169).
* the focal length is derived from fovY and the viewport height only; fovX is
  re-derived from that same focal, i.e. fx is forced equal to fy
  (src/camera/camera.ts:138-146, 196-205).

The device-side struct carries view / proj / camera center / focal; the
viewport (W, H) stays a static Python value because it determines output
shapes under jit (the reference passes it in the same uniform,
src/shaders/common.wgsl:1-8).
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

ZNEAR = 0.01
ZFAR = 100.0


@dataclasses.dataclass
class CameraData:
    """Host-side camera record, as produced by the COLMAP/JSON loaders.

    Mirrors the reference's ``CameraData`` (src/utils/load-camera.ts:4-19):
    ``rotation`` is the world-to-camera rotation matrix, ``position`` the
    camera center in world space.
    """

    id: int = 0
    position: np.ndarray | None = None  # (3,)
    rotation: np.ndarray | None = None  # (3,3) world-to-camera
    width: int | None = None
    height: int | None = None
    fx: float | None = None
    fy: float | None = None
    cx: float | None = None
    cy: float | None = None
    img_name: str | None = None
    camera_id: int | None = None


class Camera(NamedTuple):
    """Device-side camera parameters (a jittable pytree).

    Mirrors the reference's 272-byte CameraUniforms
    (src/camera/camera.ts:92-103) minus the inverse matrices, which we can
    derive on demand.
    """

    view: jnp.ndarray  # (4,4) world->view
    proj: jnp.ndarray  # (4,4) view->clip
    cam_pos: jnp.ndarray  # (3,) camera center in world space
    focal: jnp.ndarray  # (2,) pixels
    viewport: jnp.ndarray  # (2,) (W, H) as floats (also static via W/H args)


def focal2fov(focal: float, pixels: float) -> float:
    return 2.0 * math.atan(pixels / (2.0 * focal))


def fov2focal(fov: float, pixels: float) -> float:
    return pixels / (2.0 * math.tan(fov * 0.5))


def projection_matrix(fov_x: float, fov_y: float,
                      znear: float = ZNEAR, zfar: float = ZFAR) -> np.ndarray:
    """The reference's custom projection (src/camera/camera.ts:29-56).

    Y is flipped; z_ndc = (zfar*z - zfar*znear)/((zfar-znear)*z) in [0,1].
    """
    tan_y = math.tan(fov_y / 2.0)
    tan_x = math.tan(fov_x / 2.0)
    top = tan_y * znear
    right = tan_x * znear
    p = np.zeros((4, 4), dtype=np.float32)
    p[0, 0] = 2.0 * znear / (2.0 * right)
    p[1, 1] = -2.0 * znear / (2.0 * top)  # Y flip (camera.ts:43)
    p[2, 2] = zfar / (zfar - znear)
    p[2, 3] = -(zfar * znear) / (zfar - znear)
    p[3, 2] = 1.0
    return p


def view_matrix(rotation_w2c: np.ndarray, position: np.ndarray) -> np.ndarray:
    """``x_view = R (x - C)`` (src/camera/camera.ts:23-26)."""
    v = np.eye(4, dtype=np.float32)
    r = np.asarray(rotation_w2c, dtype=np.float32)[:3, :3]
    v[:3, :3] = r
    v[:3, 3] = -r @ np.asarray(position, dtype=np.float32)
    return v


def make_camera(data: CameraData, width: int | None = None,
                height: int | None = None) -> Camera:
    """Build a device Camera from a CameraData record.

    Follows ``Camera.set_preset`` + ``on_update_canvas``
    (src/camera/camera.ts:138-146,196-205): fovY comes from (fy, image
    height); the render focal comes from fovY and the *render* viewport
    height, and is used for both axes.
    """
    width = int(width if width is not None else (data.width or 0))
    height = int(height if height is not None else (data.height or 0))
    if width <= 0 or height <= 0:
        raise ValueError("camera requires a positive viewport size")

    if data.fy is not None and data.height:
        fov_y = 2.0 * math.atan(data.height / (2.0 * data.fy))
    else:
        fov_y = math.radians(45.0)  # default fovY (camera.ts:134)

    focal = 0.5 * height / math.tan(fov_y * 0.5)
    fov_x = focal2fov(focal, width)

    rot = data.rotation if data.rotation is not None else np.eye(3)
    pos = data.position if data.position is not None else np.zeros(3)

    # numpy leaves, not jnp: building a Camera must not dispatch eager
    # device ops — the viewer builds one per FRAME (five tiny transfers
    # each), and jit transfers numpy args as part of the call anyway.
    # Trainer groups stack these onto the device once at init
    # (_group_views' jnp.stack).
    return Camera(
        view=np.asarray(view_matrix(rot, pos), dtype=np.float32),
        proj=np.asarray(projection_matrix(fov_x, fov_y), dtype=np.float32),
        cam_pos=np.asarray(pos, dtype=np.float32),
        focal=np.array([focal, focal], dtype=np.float32),
        viewport=np.array([width, height], dtype=np.float32),
    )


def default_camera(width: int, height: int,
                   position=(0.0, 0.0, 5.0)) -> Camera:
    """The reference's reset camera: at (0,0,5), identity rotation, fovY 45deg
    (src/camera/camera.ts:130-136)."""
    fov_y = math.radians(45.0)
    focal = 0.5 * height / math.tan(fov_y * 0.5)
    data = CameraData(position=np.asarray(position, dtype=np.float32),
                      rotation=np.eye(3, dtype=np.float32),
                      fy=focal, height=height)
    return make_camera(data, width, height)
