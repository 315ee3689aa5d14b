"""Measure the spp-invariance claim bench.py rests on (VERDICT r2 weak
#5): the suite times mesh configs at reduced spp and asserts per-ray
cost is spp-invariant because samples scan inside one jitted program.
This probe records full-spp vs reduced-spp rays/s for one sphere-path
config (the flagship) and one mesh-path config (pyramide) so the claim
is measured, not assumed.

Run on the TPU rig:  python tools/probe_spp_invariance.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import flagship, measure_fwd  # noqa: E402


def main() -> None:
    from raytpu.config import load_scene

    rows = []
    scene, cam, cfg = flagship()
    for spp in (1000, 50, 2):
        v = measure_fwd(scene, cam, cfg.replace(spp=spp))
        rows.append(("flagship(sphere megakernel)", spp, v))

    scene, cam, cfg = load_scene("scenes/pyramide.toml")
    cfg = cfg.replace(use_megakernel=True)
    for spp in (200, 50, 5):
        v = measure_fwd(scene, cam, cfg.replace(spp=spp))
        rows.append(("pyramide(mesh megakernel)", spp, v))

    base = {}
    for name, spp, v in rows:
        base.setdefault(name, v)
        print(
            f"{name:30s} spp={spp:5d}  {v / 1e9:7.3f} Grays/s  "
            f"({v / base[name]:.3f}x of full-spp)"
        )


if __name__ == "__main__":
    main()
