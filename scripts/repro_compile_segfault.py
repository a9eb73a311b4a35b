"""Minimal repro driver for the XLA:CPU live-executable segfault (VERDICT r3
weak-#5 / #8).

Symptom (round 3, this sandbox's jax 0.9.0 / axon jaxlib): running the full
CPU test suite WITHOUT clearing jit caches segfaults inside
``backend_compile_and_load`` past ~60% of the run — the same test passes
alone and after any ~third of the suite, so the trigger is cumulative
live-executable state, not any one program. ``tests/conftest.py`` works
around it by ``jax.clear_caches()`` at module boundaries.

This script OWNS the workaround: it compiles distinct executables in a child
process until the child dies, and reports the crash threshold (or a clean
ceiling). Run modes:

  python scripts/repro_compile_segfault.py            # search (parent)
  python scripts/repro_compile_segfault.py --child N  # compile N, exit 0

The parent doubles N until the child crashes (negative returncode = signal,
e.g. -11 SIGSEGV) or the ceiling is reached. The measured threshold gives the
conftest workaround a stated safety margin: the largest test module compiles
far fewer executables than the crash bound (see
tests/test_runtime_aux.py::test_compile_cache_headroom_vs_largest_module).

Findings (2026-08-19, this host, jax 0.9.0):
- plain distinct jitted programs (elementwise, 8 virtual CPU devices): no
  crash up to the 16384-executable ceiling — live-executable COUNT alone
  does not reproduce it.
- mixed mode (plain jit / shard_map / pallas-interpret interleaved, the
  suite's program classes): ALSO clean through the 16384 ceiling.
Conclusion: the round-3 crash needs live executables PLUS suite state this
driver doesn't model (likely accumulated io_callback/FFI registrations or
fixture teardown interleavings). The ceiling still bounds what any one
module may hold live with a wide margin — tests/conftest.py enforces a
2048-compile cap per module (8x under the measured-clean ceiling) via its
backend_compile_and_load counter, so growth is caught at the offending
module rather than as a heisen-segfault later; see
tests/test_runtime_aux.py::test_compile_cache_headroom_vs_largest_module.
A parent search run records /tmp/segfault_bound.json on any future jaxlib
where a mode does crash.
"""

import argparse
import json
import os
import subprocess
import sys

CEILING = 16384


def child(n: int, mode: str) -> None:
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8").strip()
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    fns = []  # keep every executable alive, like the suite's lru caches
    outs = []
    for i in range(n):
        if mode == "mixed" and i % 3 == 1:
            # shard_map program (distinct by closure constant)
            from jax.sharding import Mesh, PartitionSpec as P

            mesh = Mesh(jax.devices()[:8], ("dp",))
            c = float(i)
            f = jax.jit(jax.shard_map(
                lambda x, _c=c: jax.lax.pmean(x + _c, "dp"),
                mesh=mesh, in_specs=P("dp"), out_specs=P()))
            outs.append(f(jnp.ones((8, 4))))
        elif mode == "mixed" and i % 3 == 2:
            # pallas interpret program (io_callback-backed)
            from jax.experimental import pallas as pl

            c = float(i)

            def kern(x_ref, o_ref, _c=c):
                o_ref[:] = x_ref[:] + _c

            f = jax.jit(pl.pallas_call(
                kern, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                interpret=True))
            outs.append(f(jnp.ones((8, 128))))
        else:
            c = float(i)
            f = jax.jit(lambda x, _c=c: x * _c + jnp.tanh(x) - _c)
            outs.append(f(jnp.ones((4, 4))))
        fns.append(f)
        if (i + 1) % 512 == 0:
            print(f"  compiled {i + 1}", flush=True)
    jax.block_until_ready(outs[-1])
    print(f"child ok: {n} live executables ({mode})", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", type=int, default=None)
    ap.add_argument("--mode", default="plain", choices=["plain", "mixed"])
    args = ap.parse_args()
    if args.child is not None:
        child(args.child, args.mode)
        return

    results = {}
    for mode in ("plain", "mixed"):
        n = 512
        bound = None
        while n <= CEILING:
            print(f"[{mode}] spawning child with n={n} ...", flush=True)
            r = subprocess.run(
                [sys.executable, __file__, "--child", str(n), "--mode", mode],
                capture_output=True, text=True, timeout=3600)
            if r.returncode != 0:
                print(f"[{mode}] child FAILED at n={n}: returncode "
                      f"{r.returncode}\n{r.stderr[-2000:]}", flush=True)
                bound = n
                break
            print(f"[{mode}] n={n} clean", flush=True)
            n *= 2
        results[mode] = {"crash_at": bound, "clean_ceiling": None if bound
                         else CEILING}
    with open("/tmp/segfault_bound.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
