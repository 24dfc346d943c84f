"""Round-4 consolidated performance inventory.

Runs the benchmark CLI (offt_tpu.bench.runfft, loop-timed methodology)
over the perf surface — c2c fwd/inv, r2c/c2r packed + numpy layout, a
batched and a 2-D slab config — against the XLA (jnp.fft) baseline in
the SAME session, so every README/ledger claim has one fresh receipt.
Big shapes that need on-device generation (768^3, 1024^3) keep their
dedicated round-4 receipts (round4_hw.jsonl steps inplace/bench4b) and
are cited, not re-run (host->device of 3.6 GB through the tunnel is
~400 s).

Appends rows to perf_inventory.jsonl; renders docs/PERF.md at the end.
Device probe + 3x backoff between steps (one tunnel stall must not void
the capture — bench.py watchdog pattern).
"""

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.abspath(os.path.join(HERE, "..", ".."))
OUT = os.path.join(HERE, "perf_inventory.jsonl")
PERF_MD = os.path.join(REPO, "docs", "PERF.md")

# (config id, human label, runfft argv tail, also-run-xla)
CONFIGS = [
    ("c2c_128b8", "8x128^3 c2c fwd", ["-N", "128", "-b", "8"], True),
    ("c2c_256", "256^3 c2c fwd", ["-N", "256"], True),
    ("c2c_320", "320^3 c2c fwd", ["-N", "320"], True),
    ("c2c_512", "512^3 c2c fwd", ["-N", "512"], True),
    ("c2c_256i", "256^3 c2c inv", ["-N", "256", "-i"], True),
    ("c2c_512i", "512^3 c2c inv", ["-N", "512", "-i"], True),
    ("r2c_256", "256^3 r2c (numpy layout)", ["-N", "256", "-R"], True),
    ("r2c_256p", "256^3 r2c packed", ["-N", "256", "-R", "--packed"], False),
    ("r2c_512", "512^3 r2c (numpy layout)", ["-N", "512", "-R"], True),
    ("r2c_512p", "512^3 r2c packed", ["-N", "512", "-R", "--packed"], False),
    ("c2r_256", "256^3 c2r (numpy layout)", ["-N", "256", "-R", "-i"], True),
    ("c2r_256p", "256^3 c2r packed",
     ["-N", "256", "-R", "-i", "--packed"], False),
    ("c2r_512", "512^3 c2r (numpy layout)", ["-N", "512", "-R", "-i"], True),
    ("c2r_512p", "512^3 c2r packed",
     ["-N", "512", "-R", "-i", "--packed"], False),
    ("c2c_2d", "64x1024^2 c2c fwd (2-D slab)",
     ["--nx", "64", "--ny", "1024", "--nz", "1024"], True),
    # BASELINE config 1: long 1-D via the four-step route
    # (kernels/fourstep.py, round 5)
    ("c2c_1d", "2^20 c2c 1-D (four-step)",
     ["--nx", "1", "--ny", "1", "--nz", str(1 << 20)], True),
    ("c2c_1d_b8", "8x2^20 c2c 1-D batched",
     ["--nx", "1", "--ny", "1", "--nz", str(1 << 20), "-b", "8"], True),
]

# cited, not re-run (methodology: chained + donate / on-device gen)
CITED = [
    ("768^3 c2c fwd", "31.1 ms offt (2094 GFLOP/s); XLA fftn OOMs",
     "round4_hw.jsonl presplit step default_ms=31.8; BENCH_LOCAL r3"),
    ("1024^3 c2c in-place", "81.9 ms (1967 GFLOP/s) on ONE 16 GB chip",
     "round4_hw.jsonl inplace step (chained, donated, zero-temp)"),
    ("1024^3 r2c packed", "80.2 ms (1005 GFLOP/s); XLA OOMs",
     "BENCH_LOCAL.jsonl r3 dual-untangle entry"),
]


def log(row):
    with open(OUT, "a") as fh:
        fh.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)


def probe(tries=3, backoff_s=180):
    script = ("import jax, jax.numpy as jnp; "
              "x = jnp.ones((8, 128)); "
              "print(float((x + 1).sum()))")
    for i in range(tries):
        try:
            r = subprocess.run([sys.executable, "-c", script], cwd=REPO,
                               capture_output=True, text=True, timeout=300)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if i + 1 < tries:
            time.sleep(backoff_s)
    return False


def run_one(cid, label, tail, algo, timeout_s=900):
    argv = [sys.executable, "-m", "offt_tpu.bench.runfft",
            "-a", algo] + tail
    t0 = time.time()
    try:
        r = subprocess.run(argv, cwd=REPO, capture_output=True, text=True,
                           timeout=timeout_s)
    except subprocess.TimeoutExpired:
        log({"id": cid, "label": label, "algo": algo,
             "t": time.strftime("%Y-%m-%dT%H:%M:%S"),
             "error": f"timeout {timeout_s}s"})
        return None
    line = None
    for ln in (r.stdout or "").splitlines():
        ln = ln.strip()
        if ln.startswith("{"):
            line = ln
    if not line:
        log({"id": cid, "label": label, "algo": algo,
             "t": time.strftime("%Y-%m-%dT%H:%M:%S"), "rc": r.returncode,
             "error": (r.stderr or "")[-400:]})
        return None
    row = json.loads(line)
    row.update({"id": cid, "label": label,
                "t": time.strftime("%Y-%m-%dT%H:%M:%S"),
                "wall_s": round(time.time() - t0, 1)})
    log(row)
    return row


def render(results):
    lines = [
        "# offt-tpu performance inventory (v5e single chip)",
        "",
        "One fresh same-session receipt per headline claim: loop-timed",
        "(`obs/profile.time_fn_looped`, fori-loop differencing, see",
        "DESIGN.md \"Timing methodology\") via the benchmark CLI, offt vs",
        "the XLA `jnp.fft` baseline. Raw rows:",
        "`docs/receipts/perf_inventory.jsonl`. Chip shows +-10% session",
        "variance; treat third digits as noise.",
        "",
        f"Captured: {time.strftime('%Y-%m-%d')} "
        "(post MXU+VPU core, padded-x route, sublane-reshape fix).",
        "",
        "| config | offt ms | offt GFLOP/s | XLA ms | speedup |",
        "|---|---|---|---|---|",
    ]
    for cid, label, _tail, want_xla in CONFIGS:
        o = results.get((cid, "offt"))
        x = results.get((cid, "xla"))
        if not o or "t_ms" not in o:
            lines.append(f"| {label} | (failed) | | | |")
            continue
        oms = o["t_ms"]
        ogf = o.get("gflops", "")
        if x and "t_ms" in x:
            sp = f"{x['t_ms'] / oms:.2f}x"
            xms = f"{x['t_ms']:.2f}"
        elif want_xla:
            sp, xms = "", "(failed)"
        else:
            # packed layouts have no XLA analogue; compare against the
            # same-shape numpy-layout XLA row if present
            base = results.get((cid.rstrip("p"), "xla"))
            if base and "t_ms" in base:
                sp = f"{base['t_ms'] / oms:.2f}x*"
                xms = f"{base['t_ms']:.2f}*"
            else:
                sp, xms = "", "n/a"
        lines.append(f"| {label} | {oms:.3f} | {ogf} | {xms} | {sp} |")
    lines += [
        "",
        "`*` packed rows compared against the numpy-layout XLA transform",
        "(XLA has no packed analogue).",
        "",
        "## Big shapes (dedicated receipts, not re-run here)",
        "",
        "| config | result | receipt |",
        "|---|---|---|",
    ]
    for label, result, receipt in CITED:
        lines.append(f"| {label} | {result} | {receipt} |")
    lines += [
        "",
        "Distributed-path wall clock is not meaningful in this",
        "environment (one real chip; the 8-device mesh is virtual CPU) —",
        "see docs/receipts/knob_sweep_cpu.jsonl for the exchange-knob",
        "evidence and MULTICHIP_r0*.json for the dryrun battery.",
        "",
    ]
    with open(PERF_MD, "w") as fh:
        fh.write("\n".join(lines))
    print(f"wrote {PERF_MD}", flush=True)


# v5e bf16 MXU peak used by the floor model (DESIGN.md §6): the stacked
# radix-dot costs 1536 MAC-slots per complex element per stage at every
# (64, rV) pick, so stack6 c2c = elems * 1536 * stages * 2 / 197e12 s.
_MXU_PEAK = 197e12


def _floor_ms(cid):
    """Physical lower bound (ms) for an offt row of config ``cid`` at the
    default stack6 precision — any draw BELOW this is a timing artifact
    (the 0.295 ms "256^3" k-pair underspread class, VERDICT r4 weak #1),
    not a measurement. r2c/c2r do half the c2c slot work (half-length z
    stage + half-width x/y stages) less the untangle; gate at 0.4x."""
    dims = {"c2c_128b8": (8, 128, 128, 128), "c2c_256": (1, 256, 256, 256),
            "c2c_320": (1, 320, 320, 320), "c2c_512": (1, 512, 512, 512),
            "c2c_256i": (1, 256, 256, 256), "c2c_512i": (1, 512, 512, 512),
            "r2c_256": (1, 256, 256, 256), "r2c_256p": (1, 256, 256, 256),
            "r2c_512": (1, 512, 512, 512), "r2c_512p": (1, 512, 512, 512),
            "c2r_256": (1, 256, 256, 256), "c2r_256p": (1, 256, 256, 256),
            "c2r_512": (1, 512, 512, 512), "c2r_512p": (1, 512, 512, 512),
            "c2c_2d": (1, 64, 1024, 1024)}
    if cid not in dims:
        return 0.0
    b, nx, ny, nz = dims[cid]
    full = b * nx * ny * nz * 1536 * 3 * 2 / _MXU_PEAK * 1e3
    return full * (0.4 if cid.startswith(("r2c", "c2r")) else 1.0)


def load_results():
    """Rebuild the results dict from the JSONL. A config re-run appends
    more rows; the MEDIAN t_ms row per (id, algo) wins (single loop-pair
    draws carry the chip's +-10% session jitter — see the bench4b 0.74 ms
    artifact in round4_hw.jsonl). Rows logged before a marker row
    {"id": X, "algo": Y, "stale": true} are dropped (used to retract the
    pre-fix inverse-XLA rows that benched the wrong transform). Two
    sanity gates (VERDICT r4 weak #1): rows the CLI itself flagged
    "unreliable" are dropped, and offt rows FASTER than the config's
    MXU-floor model are dropped as timing artifacts."""
    rows = {}
    if not os.path.exists(OUT):
        return {}
    with open(OUT) as fh:
        for ln in fh:
            try:
                row = json.loads(ln)
            except ValueError:
                continue
            key = (row.get("id"), row.get("algo"))
            if row.get("stale"):
                if row.get("before"):
                    # dated retraction: drop only draws captured before
                    # the given day (used to retire pre-methodology-fix
                    # draws once the recapture landed, VERDICT r4 #3)
                    kept = [r for r in rows.get(key, [])
                            if r.get("t", "") >= row["before"]]
                    if kept:
                        rows[key] = kept
                    else:
                        rows.pop(key, None)
                else:
                    rows.pop(key, None)
                continue
            if row.get("unreliable"):
                continue
            if (row.get("algo") == "offt" and "t_ms" in row
                    and row["t_ms"] < _floor_ms(row.get("id"))):
                continue  # sub-floor artifact draw
            if row.get("id") and row.get("algo") and "t_ms" in row:
                rows.setdefault(key, []).append(row)
    results = {}
    for key, lst in rows.items():
        lst.sort(key=lambda r: r["t_ms"])
        med = lst[len(lst) // 2] if len(lst) % 2 else lst[len(lst) // 2 - 1]
        med = dict(med, draws=len(lst),
                   t_ms_all=[r["t_ms"] for r in lst]) if len(lst) > 1 else med
        results[key] = med
    return results


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if argv and argv[0] == "--render-only":
        render(load_results())
        return
    only = set(argv[argv.index("--only") + 1].split(",")) \
        if "--only" in argv else None
    algos = set(argv[argv.index("--algos") + 1].split(",")) \
        if "--algos" in argv else None
    for cid, label, tail, want_xla in CONFIGS:
        if only and cid not in only:
            continue
        if not probe():
            log({"id": cid, "error": "device unreachable, aborting queue",
                 "t": time.strftime("%Y-%m-%dT%H:%M:%S")})
            break
        if not algos or "offt" in algos:
            run_one(cid, label, tail, "offt")
        if want_xla and (not algos or "xla" in algos):
            run_one(cid, label, tail, "xla")
    render(load_results())
    print("PERF INVENTORY DONE", flush=True)


if __name__ == "__main__":
    main()
