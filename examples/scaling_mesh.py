"""Mesh scaling sweep: sharded MSM throughput vs device count.

The reference's only parallelism is rayon on one host (SURVEY.md §2.3); the
TPU framework shards the point axis over a `jax.sharding.Mesh`
(parallel/sharded.py) and this harness records the scaling efficiency
(BASELINE.md asks >= 80% MSM scaling efficiency).

On this image only one real TPU chip is reachable, so the sweep runs on the
virtual CPU mesh (8 XLA host devices).  Virtual devices share the host's
cores, so absolute times understate a real slice — the numbers to read are
(a) correctness of the sharded path at every mesh size and (b) the
collective/orchestration overhead: T(1 dev, N pts) vs T(k devs, N pts).

Usage: python examples/scaling_mesh.py [log2_n]   (default 2^14)
Writes a markdown row set to stdout; paste into docs/PARITY.md §scaling.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
        " --xla_cpu_parallel_codegen_split_count=1").strip()

import numpy as np


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from accumulation_tpu.curves import PALLAS, weierstrass as wst
    from accumulation_tpu.fields import fp
    from accumulation_tpu.ops import msm as msm_mod
    from accumulation_tpu.parallel import sharded
    from accumulation_tpu.pc.pedersen import _sample_points

    n_log = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    n = 1 << n_log
    curve = PALLAS
    rng = np.random.default_rng(0)
    pts = _sample_points(curve, n, b"scaling-mesh")
    sc = fp.random_elements(curve.fr, rng, (n,))

    want = None
    results = []
    for ndev in (1, 2, 4, 8):
        devices = jax.devices()[:ndev]
        if len(devices) < ndev:
            continue
        mesh = sharded.make_mesh(devices)

        def run():
            out = sharded.msm_sharded(curve, mesh, pts, sc)
            return wst.to_affine(curve, out)

        got = run()  # compile + warm
        np.asarray(got.x)
        if want is None:
            want = wst.to_affine(curve, msm_mod.msm(curve, pts, sc))
        assert bool(np.asarray(wst.affine_eq(got, want))), f"ndev={ndev}"
        reps = 3
        t0 = time.time()
        for _ in range(reps):
            got = run()
            np.asarray(got.x)
        dt = (time.time() - t0) / reps
        results.append((ndev, dt))
        print(f"ndev={ndev}: {dt*1e3:9.1f} ms  ({n/dt:,.0f} points/s)",
              flush=True)

    t1 = dict(results).get(1)
    print(f"\n| devices | ms | points/s | efficiency vs 1 dev |")
    print("|---|---|---|---|")
    for ndev, dt in results:
        eff = t1 / dt / 1.0 if t1 else float("nan")  # fixed N: speedup
        print(f"| {ndev} | {dt*1e3:.1f} | {n/dt:,.0f} | "
              f"{eff:.2f}x speedup ({100*eff/1:.0f}% of linear would be "
              f"{ndev}x) |")


if __name__ == "__main__":
    main()
