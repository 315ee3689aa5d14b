"""Built-in scenes matching the reference's hardcoded configurations.

The reference embeds scenes as C arrays inside main() (main.c:330-347 and
the 10-sphere Cornell-style list in README.md:46-59). These builders
reproduce them as data, and are the BASELINE.json benchmark scenes.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from raytpu.camera import Camera, make_camera
from raytpu.core.types import Materials, RenderConfig, Scene, Spheres
from raytpu.core.vec3 import Vec3

# constant colors (rtutility.h:16-21)
RED = (1.0, 0.0, 0.0)
GREEN = (0.0, 1.0, 0.0)
BLUE = (0.0, 0.0, 1.0)
WHITE = (1.0, 1.0, 1.0)
BLACK = (0.0, 0.0, 0.0)
SKY = (0.784, 0.965, 1.0)


def spheres_from_rows(rows) -> Spheres:
    """rows: (center(3), radius, diffuse(3), emission(3), emission_strength,
    reflection, alpha, ior) tuples."""
    c = np.array([r[0] for r in rows], np.float32)
    rad = np.array([r[1] for r in rows], np.float32)
    dif = np.array([r[2] for r in rows], np.float32)
    emi = np.array([r[3] for r in rows], np.float32)
    es = np.array([r[4] for r in rows], np.float32)
    rf = np.array([r[5] for r in rows], np.float32)
    al = np.array([r[6] for r in rows], np.float32)
    io = np.array([r[7] for r in rows], np.float32)
    return Spheres(
        center=Vec3(jnp.asarray(c[:, 0]), jnp.asarray(c[:, 1]), jnp.asarray(c[:, 2])),
        radius=jnp.asarray(rad),
        mat=Materials.create(dif, emi, es, rf, al, io),
    )


def cornell_box() -> tuple[Scene, Camera, RenderConfig]:
    """The 10-sphere Cornell-style scene from README.md:46-59 (the
    reference's published default CUDA scene and BASELINE config 1)."""
    rows = [
        # center,              radius, diffuse, emission, e_str, refl, alpha, ior
        ((-501, 0, 0),   500.0, GREEN, BLACK, 0.0, 0.96, 1.0, 1.0),   # green wall
        ((0, -501, 0),   500.0, WHITE, BLACK, 0.0, 0.0, 1.0, 1.0),    # white floor
        ((501, 0, 0),    500.0, RED,   BLACK, 0.0, 0.96, 1.0, 1.0),   # red wall
        ((-0.5, 1.4, -1.2), 0.5, BLACK, (1.0, 0.6, 0.2), 4.0, 0.0, 1.0, 1.0),  # orange light
        ((0.5, 1.4, -2.2), 0.5, BLACK, (0.7, 0.2, 1.0), 4.0, 0.0, 1.0, 1.0),   # violet light
        ((0.6, -1.4, -1.0), 0.5, BLACK, (0.55, 0.863, 1.0), 2.5, 0.0, 1.0, 1.0),
        ((-0.5, -1.4, -3.1), 0.5, BLACK, (0.431, 1.0, 0.596), 2.5, 0.0, 1.0, 1.0),
        ((0, 0, -504),   500.0, WHITE, BLACK, 0.0, 0.0, 1.0, 1.0),    # back wall
        ((0, 501, 0),    500.0, WHITE, BLACK, 0.0, 0.0, 1.0, 1.0),    # ceiling
        ((0.4, -0.5, -3.3), 0.5, SKY, BLACK, 0.0, 0.99, 1.0, 1.0),    # mirror ball
    ]
    scene = Scene.from_spheres(spheres_from_rows(rows))
    cam = make_camera(
        origin=(0.34, 0.3, 0.5), target=(0.0, -0.5, -3.0), up=(0.0, 1.0, 0.0),
        vfov_deg=70.0, aspect_ratio=4.0 / 3.0,
    )
    cfg = RenderConfig(width=400, height=300, spp=100, max_bounces=5)
    return scene, cam, cfg


def cornell_box_cuda() -> tuple[Scene, Camera, RenderConfig]:
    """The CUDA binary's default 10-sphere scene
    (/root/reference/main_cuda.cu:207-221) with its integrator knobs: the
    emissive HSL boost of L*=1.2 (main_cuda.cu:89-98) and AO defaults
    (useAO=true, intensity 3, main_cuda.cu:202-206)."""
    rows = [
        ((-501, 0, 0),   500.0, GREEN, BLACK, 0.0, 0.96, 1.0, 1.0),
        ((0, -501, 0),   500.0, WHITE, BLACK, 0.0, 0.4, 1.0, 1.0),
        ((501, 0, 0),    500.0, RED,   BLACK, 0.0, 0.96, 1.0, 1.0),
        ((-0.5, 1.4, -3.0), 0.5, BLACK, (1.0, 0.6, 0.2), 8.0, 0.0, 1.0, 1.0),
        ((0.5, 1.4, -2.0), 0.5, BLACK, (0.7, 0.2, 1.0), 8.0, 0.0, 1.0, 1.0),
        ((-0.5, -1.4, -1.5), 0.5, BLACK, (0.55, 0.863, 1.0), 4.5, 0.0, 1.0, 1.0),
        ((0.5, -1.4, -3.1), 0.5, BLACK, (0.431, 1.0, 0.596), 4.5, 0.0, 1.0, 1.0),
        ((0, 0, -504),   500.0, WHITE, BLACK, 0.0, 0.0, 1.0, 1.0),
        ((0, 501, 0),    500.0, WHITE, BLACK, 0.0, 0.0, 1.0, 1.0),
        ((-0.4, -0.5, -3.3), 0.5, SKY, BLACK, 0.0, 1.0, 1.0, 1.0),
    ]
    scene = Scene.from_spheres(spheres_from_rows(rows))
    # camera literals from main_cuda.cu:176-180
    cam = make_camera(
        origin=(-0.7, 0.0, 0.0), target=(0.3, -0.5, -3.0), up=(0.0, 1.0, 0.0),
        vfov_deg=70.0, aspect_ratio=4.0 / 3.0,
    )
    cfg = RenderConfig(
        width=1000, height=750, spp=1000, max_bounces=5,
        hsl_l_factor=1.2, use_ao=True, ao_intensity=3.0,
    )
    return scene, cam, cfg


def cornell_box_dof_ao() -> tuple[Scene, Camera, RenderConfig]:
    """BASELINE config 2: sphere scene + DoF + AO, 800x600, 500 spp."""
    scene, cam, cfg = cornell_box()
    cfg = cfg.replace(
        width=800, height=600, spp=500,
        use_ao=True, ao_intensity=2.5,
        aperture_x=0.3, aperture_y=0.3, focus_distance=3.0,
    )
    return scene, cam, cfg
