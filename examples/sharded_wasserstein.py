"""Domain-decomposed Wasserstein-1 on a device mesh.

darsia_tpu-only capability (the reference is single-process): one mass
image's rows are sharded over the mesh and the entire Beckmann Newton
iteration runs inside a single ``shard_map`` program — for problems
larger than one chip's HBM.  On a machine without multiple accelerators
this script forces an 8-device virtual CPU mesh so it runs anywhere.
"""

import os

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    # Demo-friendly: build a virtual 8-device mesh when only one real
    # device exists. Must happen before the first jax import.
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

import _data  # noqa: F401 (sys.path bootstrap for checkouts)
import darsia_tpu as darsia


def main() -> None:
    import jax

    # Environments that pin a hardware platform (sitecustomize) ignore
    # JAX_PLATFORMS; prefer the virtual CPU mesh when only one real
    # device exists (same dance as __graft_entry__.dryrun_multichip).
    if len(jax.devices()) < 2:
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass
    from jax.sharding import Mesh

    n = 32 if os.environ.get("DARSIA_TPU_FAST") else 64
    src = np.zeros((n, n))
    src[4 : n // 3, 4 : n // 3] = 1
    dst = np.zeros((n, n))
    dst[n // 2 :, n // 2 :] = 1
    meta = {"width": 1.0, "height": 1.0, "scalar": True}
    src_img = darsia.Image(src / src.sum() * n * n, **meta)
    dst_img = darsia.Image(dst / dst.sum() * n * n, **meta)

    devices = jax.devices()
    if len(devices) < 2:
        devices = jax.devices("cpu")
    devices = devices[:8]
    mesh = Mesh(np.array(devices), ("space",))
    distance, info = darsia.wasserstein_distance(
        src_img,
        dst_img,
        method="sharded_newton",
        options={
            "mesh": mesh,
            "num_iter": 300,
            "tol_increment": 1e-4,
            "tol_distance": 1e-4,
            "aa_depth": 5,
            "return_info": True,
        },
    )
    print(
        f"sharded W1 over {len(devices)} devices: {distance:.6f} "
        f"({info['number_iterations']} Newton iterations)"
    )

    reference = darsia.wasserstein_distance(
        src_img,
        dst_img,
        method="newton",
        options={
            "num_iter": 300,
            "tol_increment": 1e-4,
            "tol_distance": 1e-4,
            "mobility_mode": darsia.MobilityMode("cell_based"),
            "l1_mode": darsia.L1Mode("constant_cell_projection"),
            "L": 1e9,
            "aa_depth": 5,
        },
    )
    rel = abs(distance - float(reference)) / float(reference)
    print(f"single-device W1: {float(reference):.6f} (rel diff {rel:.2e})")
    assert rel < 1e-3


if __name__ == "__main__":
    main()
