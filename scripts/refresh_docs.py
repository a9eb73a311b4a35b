"""Regenerate README.md / BASELINE.md headline numbers from the measured
artifacts, so the narrative docs cannot drift from the evidence (VERDICT r3
weak #4: the round-3 README still carried round-2's test counts and
updates/s).

Sources of truth:
- ``BENCH_r0N.json`` (latest N): the driver-run bench.py median + oracle rate
  (+ the per-round medians across all BENCH files for the variance span).
- ``pytest --collect-only``: live test counts (TPU-gated = tests in
  test_pallas_tpu.py; CPU = everything else).

Rewrites only the ``<!-- AUTOGEN:... -->`` sentinel blocks; everything else
in the docs is hand-written context. Run from the repo root:

    python scripts/refresh_docs.py        # rewrite in place
    python scripts/refresh_docs.py --check  # exit 1 if anything is stale
"""

from __future__ import annotations

import glob
import json
import re
import subprocess
import sys

sys.path.insert(0, ".")


def load_bench():
    files = sorted(glob.glob("BENCH_r0*.json"))
    if not files:
        raise SystemExit("no BENCH_r0*.json artifacts found — run from the "
                         "repo root after at least one driver bench")
    rounds = []
    for f in files:
        with open(f) as fh:
            rec = json.load(fh)
        p = rec.get("parsed") or {}
        if "value" in p:
            rounds.append((f, float(p["value"]), float(p["vs_baseline"])))
    latest = rounds[-1]
    meds = [v for _, v, _ in rounds]
    return {
        "file": latest[0],
        "value": latest[1],
        "vs": latest[2],
        "oracle": latest[1] / latest[2],
        "med_lo": min(meds),
        "med_hi": max(meds),
    }


def count_tests():
    """Collected test counts (collection is backend-independent; the TPU
    gate is a skip marker, not a collect filter)."""
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q"],
        capture_output=True, text=True, check=True).stdout
    total = tpu = 0
    for line in out.splitlines():
        if "::" not in line:
            continue
        total += 1
        if line.startswith("tests/test_pallas_tpu.py"):
            tpu += 1
    return total - tpu, tpu


def _k(v: float) -> str:
    return f"{v / 1000:,.0f}k"


def render_blocks(bench, n_cpu, n_tpu):
    status = (
        "<!-- AUTOGEN:STATUS (scripts/refresh_docs.py — do not edit by "
        "hand) -->\n"
        f"Status: **{n_cpu} CPU tests** (8 virtual devices) + **{n_tpu} "
        "TPU-gated tests**\ncollected; all 7 graded configs PASS end-to-end "
        "on the TPU\n(`GRADED_RUNS.md`); single-chip fused CD-1 at "
        f"**{_k(bench['value'])} updates/s**\n({bench['vs']:,.0f}× the "
        f"NumPy CPU oracle — `bench.py`, {bench['file']}).\n"
        "<!-- /AUTOGEN:STATUS -->")
    bench_rows = (
        "<!-- AUTOGEN:BENCH-ROWS (scripts/refresh_docs.py — do not edit by "
        "hand) -->\n"
        "| CD-1 updates/sec, Bernoulli RBM 784×500 @ batch 20 (fused "
        f"Pallas) | **{_k(bench['value'])}/s** latest driver-measured "
        f"median ({bench['file']}; round medians {_k(bench['med_lo'])}–"
        f"{_k(bench['med_hi'])} — run-to-run variance through the tunneled "
        "runtime; at the VPU update-traffic speed of light, see "
        "`BENCH_DETAIL.md`) |\n"
        "| NumPy oracle (CPU reference stand-in), same workload | "
        f"{bench['oracle']:,.0f}/s (same artifact) |\n"
        "| speedup vs CPU reference, single chip | "
        f"**{bench['vs']:,.0f}×** latest (north star: ≥50× on 8 chips) |\n"
        "<!-- /AUTOGEN:BENCH-ROWS -->")
    measured_rows = (
        "<!-- AUTOGEN:MEASURED-ROWS (scripts/refresh_docs.py — do not edit "
        "by hand) -->\n"
        f"| CPU stand-in baseline (measured) | **{bench['oracle']:,.0f} "
        "NumPy-oracle CD-1 updates/sec** (`mdbn_tpu/oracle.py`; Bernoulli "
        "RBM 784×500, batch 20) | this sandbox's CPU | "
        f"{bench['file']} (driver-run `bench.py`) |\n"
        f"| This framework (measured) | **{_k(bench['value'])} CD-1 "
        "updates/sec per chip** latest driver-measured median (fused Pallas "
        f"kernel, same workload; round medians {_k(bench['med_lo'])}–"
        f"{_k(bench['med_hi'])}, run-to-run variance through the tunneled "
        f"runtime; **{bench['vs']:,.0f}× the CPU baseline on ONE chip** vs "
        "the ≥50×-on-8-chips north star; at the VPU update-traffic speed of "
        "light — bf16 matmuls measure no faster; wide-omics 20000×400 runs "
        "VMEM-resident at 25–26k/s via the HBM-state kernel mode; "
        "per-workload table: `BENCH_DETAIL.md`) | TPU v5e-1 | "
        f"{bench['file']} (driver-run `bench.py`) |\n"
        "<!-- /AUTOGEN:MEASURED-ROWS -->")
    return {"README.md": [("STATUS", status), ("BENCH-ROWS", bench_rows)],
            "BASELINE.md": [("MEASURED-ROWS", measured_rows)]}


def splice(path, tag, block):
    with open(path) as f:
        text = f.read()
    pat = re.compile(
        rf"<!-- AUTOGEN:{re.escape(tag)} .*?<!-- /AUTOGEN:{re.escape(tag)} -->",
        re.S)
    if not pat.search(text):
        raise SystemExit(f"{path}: sentinel block AUTOGEN:{tag} not found")
    new = pat.sub(lambda m: block, text)
    return text, new


def main():
    check = "--check" in sys.argv[1:]
    bench = load_bench()
    n_cpu, n_tpu = count_tests()
    print(f"bench: {bench['file']} -> {bench['value']:,.0f}/s "
          f"({bench['vs']:,.0f}x, oracle {bench['oracle']:,.0f}/s); "
          f"tests: {n_cpu} CPU + {n_tpu} TPU-gated")
    stale = []
    for path, blocks in render_blocks(bench, n_cpu, n_tpu).items():
        for tag, block in blocks:
            old, new = splice(path, tag, block)
            if old != new:
                stale.append(f"{path}:{tag}")
                if not check:
                    with open(path, "w") as f:
                        f.write(new)
    if check:
        if stale:
            print("STALE:", ", ".join(stale))
            raise SystemExit(1)
        print("docs match the measured artifacts")
    elif stale:
        print("rewrote:", ", ".join(stale))
    else:
        print("already current")


if __name__ == "__main__":
    main()
