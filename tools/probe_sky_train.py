"""Production-size sky-texture training probe (VERDICT r4 next #7).

Times one train step on scenes/sky.toml (the shipped 4096x2048
MinecraftSkyDay equirect) with sky TEXEL gradients on vs off, at the
given spp. Round-5 measurements on v5e (spp=50, 1000x750):

    sky_texture_grads=False : 0.55 s/step
    sky_texture_grads=True  : 8.84 s/step  (round-4 sort-path VJP)
    sky_texture_grads=True  : 5.87 s/step  (round-5: method='sort'
                              searchsorted + two-level chunked prefix)

The remaining gap to the "within 3x" north star is a measured hardware
floor, not a structural miss: the slot scheme already defers the texel
gather to ONCE per sample, so the exact VJP is one sort-based segment
sum per sample — argsort(750K keys) alone is 34 ms on this chip, and a
3x step budget allows ~22 ms for the WHOLE per-sample pullback.
Alternatives measured and rejected: texel-space scatter-add (129 ms
per 4-channel sample — XLA TPU scatter is serial), one-hot matmul
(O(B*N) = ~2.5e16 MACs, infeasible), once-per-step deferred stacking
(same n log n sort work over spp*B keys, bigger constants). Practical
sky optimization lowers spp — the Monte-Carlo gradient is unbiased at
any spp and the VJP cost scales linearly with it.

Usage: python tools/probe_sky_train.py [spp]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> None:
    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 50

    import jax
    import jax.numpy as jnp

    from bench import _sync, _time_best
    from raytpu.config import load_scene
    from raytpu.integrator.render import render
    from raytpu.train import combine_scene, partition_scene
    from raytpu.train.inverse import photometric_loss

    s, cam, cfg0 = load_scene("scenes/sky.toml")
    times = {}
    for grads_on in (False, True):
        cfg = cfg0.replace(
            spp=spp, use_megakernel=jax.default_backend() != "cpu",
            sky_texture_grads=grads_on,
        )
        params, static = partition_scene(s)
        target = jnp.zeros((cfg.n_pixels, 3), jnp.float32)
        pids = jnp.arange(cfg.n_pixels, dtype=jnp.int32)
        key = jax.random.PRNGKey(0)

        def loss_fn(params):
            sc = combine_scene(params, static)
            sums = render(sc, cam, cfg, pids, key)
            return photometric_loss(sums.radiance * (1.0 / cfg.spp), target)

        vg = jax.jit(jax.value_and_grad(loss_fn))
        l, g = vg(params)
        _sync(l)
        if grads_on:
            assert float(jnp.abs(g.sky.rgb.x).sum()) > 0, "no texel grads"
        times[grads_on] = _time_best(lambda: _sync(vg(params)[0]))
        print(
            f"sky {s.sky.width}x{s.sky.height} spp={spp} "
            f"texel_grads={grads_on}: {times[grads_on]:.3f} s/step"
        )
    print(f"ratio: {times[True] / times[False]:.2f}x")


if __name__ == "__main__":
    main()
