"""Two-process DCN smoke test: `jax.distributed` + the ("dcn","ici") grid.

Exercises the multi-PROCESS branches of parallel/multihost.py that the
8-virtual-device single-process suite cannot reach (VERDICT r04 missing #4):

  * `multihost.initialize` -> `jax.distributed.initialize` with an explicit
    coordinator (the bare-VM bring-up path, docs/MULTIHOST.md);
  * `make_mesh_2d` taking the `create_hybrid_device_mesh` branch
    (jax.process_count() > 1): "dcn" maps onto process granules, "ici"
    stays within each process's devices;
  * `msm_sharded_2d` over the global mesh — both the small-N bitserial
    shard path and the full per-shard Pippenger path with its grid-maxed
    slot-bound HOST SYNC (np.asarray of a replicated global array under
    multi-controller JAX);
  * cross-process collectives on CPU via gloo
    (jax_cpu_collectives_implementation).

Each process owns 4 virtual CPU devices -> a global (2, 4) grid of 8.
Inputs are full-size numpy arrays identical on both processes (same seed)
— the standard replicated-host-input pattern; shard_map shards them onto
the global mesh.  Ground truth is the single-device product MSM on the
full data, computed locally in each process.

Usage:
    python scripts/dcn_smoke.py            # launcher: spawns 2 workers
    python scripts/dcn_smoke.py --worker I --port P   # (internal)
"""

import argparse
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

N_LOCAL_DEVICES = 4
N_PROCESSES = 2


def worker(idx: int, port: int) -> None:
    # env must be set before the first jax import (conftest pattern)
    assert os.environ.get("JAX_PLATFORMS") == "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    import numpy as np

    from accumulation_tpu.curves import PALLAS, weierstrass as wst
    from accumulation_tpu.fields import fp
    from accumulation_tpu.ops import msm as msm_mod
    from accumulation_tpu.parallel import multihost
    from accumulation_tpu.pc.pedersen import _sample_points

    multihost.initialize(coordinator_address=f"127.0.0.1:{port}",
                         num_processes=N_PROCESSES, process_id=idx)
    assert jax.process_count() == N_PROCESSES, jax.process_count()
    assert len(jax.local_devices()) == N_LOCAL_DEVICES
    assert len(jax.devices()) == N_PROCESSES * N_LOCAL_DEVICES
    print(f"[worker {idx}] distributed up: {jax.process_count()} procs, "
          f"{len(jax.devices())} global devices", flush=True)

    mesh = multihost.make_mesh_2d(N_PROCESSES, N_LOCAL_DEVICES)
    # the hybrid builder must put this process's devices in ONE dcn row
    row_procs = {d.process_index for d in mesh.devices[idx]}
    assert row_procs == {idx}, (
        f"dcn row {idx} spans processes {row_procs} — ICI axis leaked "
        "across hosts")

    curve = PALLAS
    rng = np.random.default_rng(7)
    for n, label in ((256, "bitserial shards"),
                     (2048, "pippenger shards + slot-bound host sync")):
        pts = _sample_points(curve, n, b"dcn-smoke|" + str(n).encode())
        sc = fp.random_elements(curve.fr, rng, (n,))
        t0 = time.time()
        got = wst.to_affine(
            curve, multihost.msm_sharded_2d(curve, mesh, pts, sc))
        want = wst.to_affine(curve, wst.msm_bitserial(curve, pts, sc)) \
            if n <= 256 else \
            wst.to_affine(curve, msm_mod.msm(curve, pts, sc, c=4))
        ok = bool(np.asarray(wst.affine_eq(got, want)).all())
        print(f"[worker {idx}] n={n} ({label}): "
              f"{'OK' if ok else 'MISMATCH'} in {time.time()-t0:.1f}s",
              flush=True)
        if not ok:
            raise SystemExit(1)
    print(f"[worker {idx}] DCN_SMOKE_PASS", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", type=int, default=None)
    ap.add_argument("--port", type=int, default=9911)
    args = ap.parse_args()
    if args.worker is not None:
        worker(args.worker, args.port)
        return

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "host_platform_device_count" not in f]
    flags.append(
        f"--xla_force_host_platform_device_count={N_LOCAL_DEVICES}")
    if not any("parallel_codegen_split" in f for f in flags):
        flags.append("--xla_cpu_parallel_codegen_split_count=1")
    env["XLA_FLAGS"] = " ".join(flags)

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--worker", str(i), "--port", str(args.port)],
            env=env, cwd=ROOT,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(N_PROCESSES)
    ]
    deadline = time.time() + float(os.environ.get("DCN_SMOKE_TIMEOUT",
                                                  "1500"))
    outs = [None] * N_PROCESSES
    for i, p in enumerate(procs):
        try:
            outs[i], _ = p.communicate(timeout=max(1, deadline - time.time()))
        except subprocess.TimeoutExpired:
            p.kill()
            outs[i], _ = p.communicate()
    ok = all(p.returncode == 0 for p in procs) and all(
        "DCN_SMOKE_PASS" in (o or "") for o in outs)
    for i, o in enumerate(outs):
        sys.stdout.write(f"--- worker {i} (rc={procs[i].returncode}) ---\n")
        sys.stdout.write((o or "")[-3000:] + "\n")
    print("DCN smoke:", "PASS" if ok else "FAIL", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
