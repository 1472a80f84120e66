#!/usr/bin/env python3
"""Headline benchmark: exact-kNN patch retrieval throughput on one chip.

Measures the performance-critical kernel of the Hummingbird evaluation —
exact k=30 nearest-neighbour search of ViT-B/14 patch queries against a
1.024M-row memory bank (1/10th of the 1024*10^4 headline bank,
reference README.md:283-286) — and prints ONE JSON line:

    {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

vs_baseline normalizes against the north-star requirement from
BASELINE.md: full-VOC eval (~2M patch queries) against a 10.24M-row bank
in <10 min on 8 chips => >= 413 q/s/chip at 10.24M rows, i.e. an
equivalent 4130 q/s/chip at this benchmark's 1.024M rows. vs_baseline > 1
means the kNN is faster than the end-to-end budget requires.

Robustness (round 3, after BENCH_r02 recorded rc=124/parsed=null):
the headline is measured FIRST and the JSON line prints IMMEDIATELY
after it; every diagnostic (IVF, XLA, ViT forward, subprocess e2e) runs
AFTER the JSON and cannot affect it. The remote Mosaic compiler is a
lottery (same kernel observed 2s..1363s; a just-compiled executable can
run pathologically slow until the remote host settles), so the headline
walks a fallback ladder under per-variant compile budgets —
merge_mode='carry' (fastest steady-state) -> 'carry_lazy' (identical
semantics, reliably fast compiles) -> the XLA blockwise kernel (no
Mosaic at all) — re-measures once after a settle when a variant times
pathologically slow, and reports the best variant measured before the
global deadline.
"""

import json
import os
import sys
import threading
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


# --- Guaranteed-emission contract (round 4) -------------------------------
# BENCH_r02 and BENCH_r03 both recorded parsed=null: r02 because the Mosaic
# compile lottery ate the whole budget before the JSON line, r03 because the
# device was unreachable and the run hung in in-process backend init until
# the driver's timeout (rc=124). The record must land NO MATTER WHAT:
#   * emit() prints the one JSON line exactly once (thread-safe);
#   * a watchdog armed at process start emits an error record and hard-exits
#     if nothing has printed by HBIRD_BENCH_WATCHDOG seconds (default 1500 —
#     safely inside the driver's observed ~30 min window);
#   * a failed device wait emits immediately and exits instead of walking
#     into a hangable jax.devices() (the r03 failure).
METRIC_NAME = "exact_knn_queries_per_sec_per_chip_1.024M_bank_k30"
TARGET_QPS = 4130.0  # north-star-equivalent q/s/chip at 1.024M rows

_EMIT_LOCK = threading.Lock()
_JSON_EMITTED = threading.Event()


def emit(value: float, error: str | None = None) -> bool:
    """Print the single benchmark JSON line (at most once per process).

    Returns True iff THIS call printed the record — callers that need to
    take ownership of teardown (the watchdog) key off the return value
    rather than a separate check-then-act read of the flag.
    """
    with _EMIT_LOCK:
        if _JSON_EMITTED.is_set():
            return False
        rec = {
            "metric": METRIC_NAME,
            "value": round(float(value), 1),
            "unit": "queries/s/chip",
            "vs_baseline": round(float(value) / TARGET_QPS, 3),
        }
        if error:
            rec["error"] = error
        print(json.dumps(rec), flush=True)
        sys.stdout.flush()
        _JSON_EMITTED.set()
        return True


def arm_watchdog(deadline_ts: float) -> None:
    """Hard guarantee: if the JSON line has not printed by deadline_ts,
    print an error record and _exit. os._exit over sys.exit because the
    main thread may be wedged inside a remote backend init / compile that
    ignores interrupts; leaking an in-flight compile at exit is the known
    cost (tunnel wedge for the next process) and is preferred to an empty
    scoreboard (judge directive, VERDICT r3 item 1)."""

    def fire() -> None:
        while not _JSON_EMITTED.is_set():
            dt = deadline_ts - time.time()
            if dt <= 0:
                break
            time.sleep(min(dt, 5.0))
        # emit() returning False means main landed the record (possibly
        # between our wake-up and this call) — let main finish its own
        # teardown (compile-thread drain) instead of hard-exiting
        # underneath it. Only when OUR emit printed do we own shutdown.
        if emit(0.0, error="watchdog: no measurement before deadline"):
            log("[watchdog] deadline hit with no JSON — emitted error "
                "record and exiting")
            os._exit(0)

    threading.Thread(target=fire, daemon=True, name="bench-watchdog").start()


D, K = 768, 30
M_ROWS = 1_024_000
BATCH, N_PATCHES = 64, (518 // 14) ** 2  # ViT-B/14 @ 518
Q_N = BATCH * N_PATCHES

if os.environ.get("HBIRD_BENCH_SMOKE"):  # tiny-shape control-flow check
    M_ROWS, Q_N = 4096, 512

# Healthy v5e speeds: pallas ~50-60k q/s, XLA blockwise ~6.1k. Below a
# variant's sane threshold the executable or remote host is misbehaving
# and a settle+retry is warranted.
# Hard cap from AFTER data upload to the JSON line. The first attempt at
# a concurrent compile ladder measured NOTHING in 900s (three first-call
# threads serialize somewhere between the tunnel and the remote
# compiler), so the ladder is strictly sequential with the
# reliably-compiling XLA rung FIRST: a real number lands within ~2 min
# and every later rung can only improve it.
HEADLINE_DEADLINE_S = float(os.environ.get("HBIRD_BENCH_DEADLINE", 1000.0))


def _force(x) -> None:
    """Force remote execution + transfer: block_until_ready alone does not
    capture the tunnel's async dispatch (CLAUDE.md perf facts)."""
    float(np.asarray(x).sum())


class Variant:
    """One rung of the fallback ladder: the first call (compile) runs in
    a daemon thread so a runaway remote Mosaic compile can be abandoned
    at the budget; rungs run STRICTLY SEQUENTIALLY (concurrent first
    calls through the tunnel starve each other — measured round 3) and
    a rung whose compile thread is still live blocks the next rung
    until it finishes or the per-rung budget expires."""

    def __init__(self, name, fn, compile_budget_s, iters=3, sane_qps=15_000.0):
        self.name = name
        self.fn = fn
        self.compile_budget_s = compile_budget_s
        self.iters = iters
        self.sane_qps = sane_qps
        self._box = {}
        self._thread = None

    def start_compile(self):
        def work():
            t0 = time.time()
            try:
                vals, _ = self.fn()
                _force(vals[:1])
                self._box["compile_s"] = time.time() - t0
            except Exception as e:  # noqa: BLE001 — report, ladder continues
                self._box["err"] = repr(e)

        self._thread = threading.Thread(target=work, daemon=True)
        self._thread.start()

    def wait(self, budget_s):
        self._thread.join(budget_s)
        if "compile_s" in self._box:
            log(f"[{self.name}] first call (incl. compile): "
                f"{self._box['compile_s']:.1f}s")
            return True
        if "err" in self._box:
            log(f"[{self.name}] FAILED: {self._box['err'][:300]}")
        else:
            log(f"[{self.name}] compile exceeded {budget_s:.0f}s budget; "
                "abandoning this rung (thread keeps running)")
        return False

    @property
    def ready(self):
        return "compile_s" in self._box

    @property
    def pending(self):
        return self._thread is not None and self._thread.is_alive()

    def time_qps(self):
        t0 = time.time()
        best_dt = float("inf")
        for _ in range(self.iters):
            t1 = time.time()
            vals, _ = self.fn()
            _force(vals[:1])
            best_dt = min(best_dt, time.time() - t1)
        qps = Q_N / best_dt
        log(
            f"[{self.name}] best {best_dt*1e3:.1f} ms/batch over {self.iters} "
            f"({(time.time()-t0):.1f}s total) -> {qps:,.0f} q/s/chip "
            f"({Q_N*M_ROWS*D*2/best_dt/1e12:.1f} TFLOP/s effective)"
        )
        return qps


def measure_headline(q_bf16, bank_bf16, deadline):
    from hbird_tpu.ops.knn import exact_knn
    from hbird_tpu.ops.knn_pallas import pallas_knn

    def pallas_fn(mode):
        return lambda: pallas_knn(
            q_bf16, bank_bf16, K, block_q=256, block_m=8192, merge_mode=mode
        )

    # Reliable-first: XLA compiles dependably (~15-30s) and pins a real
    # number; the pallas rungs then only improve it. carry_lazy compiles
    # in 2-26s even when the Mosaic cache misbehaves; carry (the fastest
    # steady-state) gets whatever budget remains.
    ladder = [
        Variant(
            "xla blockwise",
            lambda: exact_knn(
                q_bf16, bank_bf16, K, query_block=8192, bank_block=32768
            ),
            180.0,
            iters=1,
            sane_qps=3_000.0,
        ),
        Variant("pallas carry_lazy", pallas_fn("carry_lazy"), 150.0),
        Variant("pallas carry", pallas_fn("carry"), 1e9),  # rest of budget
    ]

    best = 0.0
    measured = {}
    pending = []
    for v in ladder:
        remaining = deadline - time.time()
        if remaining < 45 and best > 0:
            log(f"[headline] deadline near; skipping {v.name}")
            continue
        # Leave the last rung everything minus a timing allowance; cap the
        # earlier rungs at their own budgets.
        budget = min(v.compile_budget_s, max(30.0, remaining - 45))
        v.start_compile()
        if not v.wait(budget):
            if v.pending:
                pending.append(v)
                # Sequentiality: the abandoned compile still occupies the
                # tunnel/compiler; later rungs would queue behind it and
                # burn their budgets waiting. Give it a grace window
                # sized to what's left before moving on.
                grace = max(0.0, min(deadline - time.time() - 90, 120.0))
                if grace > 0 and v.wait(grace):
                    pending.remove(v)
                else:
                    continue
            else:
                continue
        qps = v.time_qps()
        measured[v.name] = qps
        if qps < v.sane_qps and time.time() < deadline - 90:
            # Just-compiled executables have measured far below steady
            # state until the remote host settles — retry once.
            log(f"[{v.name}] pathologically slow; settling 30s + retry")
            time.sleep(30)
            qps = max(qps, v.time_qps())
            measured[v.name] = qps
        best = max(best, qps)

    # Abandoned compile threads may land before the deadline — harvest.
    for v in pending:
        grace = deadline - time.time() - 30
        if grace > 0 and v.wait(grace):
            measured[v.name] = v.time_qps()
            best = max(best, measured[v.name])

    return best, measured, [v for v in pending if v.pending]


def diagnostics(q_bf16, bank_bf16, measured, rng):
    """Everything below runs AFTER the headline JSON line; failures and
    overruns here are logged to stderr and cannot affect the record."""
    import jax
    import jax.numpy as jnp

    # IVF tree backend on a clustered rearrangement of the same bank scale.
    try:
        from hbird_tpu.ops.ivf import (
            assign_leaves, balanced_layout, build_ivf_arrays, ivf_search,
            train_centroids, tree_layout,
        )

        n_leaves, cap = tree_layout(M_ROWS, 512)
        cent = train_centroids(
            bank_bf16[:131072].astype(jnp.float32), n_leaves, iters=8
        )
        choices = assign_leaves(bank_bf16, cent, n_choices=3)
        slots, fill = balanced_layout(choices, n_leaves, cap)
        ivf_bank, _, _ = build_ivf_arrays(bank_bf16, None, slots, n_leaves, cap)
        leaf_valid = jnp.asarray(fill, jnp.int32)

        t0 = time.time()
        vals, _ = ivf_search(
            q_bf16, ivf_bank, cent, leaf_valid, K, cap=cap, n_probe=32
        )
        _force(vals[:1])
        log(f"[ivf bf16 L=32/512] first call (incl. compile): {time.time()-t0:.1f}s")
        best_dt = float("inf")
        for _ in range(3):
            t1 = time.time()
            vals, _ = ivf_search(
                q_bf16, ivf_bank, cent, leaf_valid, K, cap=cap, n_probe=32
            )
            _force(vals[:1])
            best_dt = min(best_dt, time.time() - t1)
        log(f"[ivf bf16 L=32/512] {best_dt*1e3:.1f} ms/batch -> "
            f"{Q_N/best_dt:,.0f} q/s/chip")
        del ivf_bank
    except Exception as e:  # noqa: BLE001
        log(f"[ivf bf16] skipped: {e}")

    # Expanded-norm L2 variant of the fused kernel (round 4): should land
    # within ~1.1x of the dot headline (one extra (1, BLOCK_M) bias
    # stream + subtract).
    try:
        from hbird_tpu.ops.knn_pallas import pallas_knn

        t0 = time.time()
        vals, _ = pallas_knn(
            q_bf16, bank_bf16, K, block_q=256, block_m=8192, distance="l2"
        )
        _force(vals[:1])
        log(f"[l2 carry] first call (incl. compile): {time.time()-t0:.1f}s")
        best_dt = float("inf")
        for _ in range(3):
            t1 = time.time()
            vals, _ = pallas_knn(
                q_bf16, bank_bf16, K, block_q=256, block_m=8192,
                distance="l2",
            )
            _force(vals[:1])
            best_dt = min(best_dt, time.time() - t1)
        log(f"[l2 carry] {best_dt*1e3:.1f} ms/batch -> "
            f"{Q_N/best_dt:,.0f} q/s/chip")
    except Exception as e:  # noqa: BLE001
        log(f"[l2 carry] skipped: {e}")

    # Backbone forward throughput.
    try:
        from hbird_tpu.models.vit import VIT_PRESETS, ViT

        vit = ViT(VIT_PRESETS["dinov2_vitb14"])
        params = vit.prepare_params(vit.init(jax.random.PRNGKey(0)), 518)
        imgs = jnp.asarray(rng.normal(size=(16, 3, 518, 518)), jnp.float32)

        fwd = jax.jit(lambda p, x: vit.apply(p, x)["x_norm_patchtokens"])
        out = fwd(params, imgs)
        _force(out[:1, :1])
        t0 = time.time()
        for _ in range(3):
            out = fwd(params, imgs)
            _force(out[:1, :1])
        dt = (time.time() - t0) / 3
        log(f"[fwd] ViT-B/14 @518 f32: {16/dt:.1f} img/s/chip")
    except Exception as e:  # noqa: BLE001
        log(f"[fwd] skipped: {e}")

    # End-to-end engine run in a subprocess (stderr only). Bounded so the
    # whole bench exits cleanly even when the Mosaic lottery strikes; a
    # SIGKILL mid-TPU-op wedges the tunnel, so the subprocess gets SIGTERM
    # headroom via its own timeout handling (subprocess.run sends SIGKILL
    # only after terminate fails).
    try:
        import subprocess
        import tempfile

        here = os.path.dirname(os.path.abspath(__file__))
        # Stream output to a file (not capture_output): on a timeout the
        # partial log survives — round 2 lost the whole e2e record when
        # the subprocess overran.
        with tempfile.NamedTemporaryFile(
            "w+", suffix=".log", prefix="bench_e2e_", delete=False
        ) as f:
            proc = subprocess.Popen(
                [
                    sys.executable, "-u",
                    os.path.join(here, "scripts", "bench_e2e.py"),
                    "--preset", "dino_vits16", "--input-size", "224",
                    "--batch-size", "16", "--n-train", "512",
                    "--n-val", "64",
                ],
                cwd=here, stdout=f, stderr=subprocess.STDOUT, text=True,
            )
            try:
                rc = proc.wait(timeout=1800)
            except subprocess.TimeoutExpired:
                # NEVER SIGKILL a process mid-TPU-operation (wedges the
                # remote tunnel for the next process — subprocess.run
                # does exactly that on timeout). SIGTERM + grace; if it
                # still won't die, leave it running and let it finish.
                proc.terminate()
                try:
                    rc = proc.wait(timeout=120)
                except subprocess.TimeoutExpired:
                    rc = "timeout (left running — do not SIGKILL mid-TPU-op)"
            f.seek(0)
            out = f.read()
        log("[e2e] " + " | ".join(
            line for line in out.splitlines()
            if any(s in line for s in ("memory+index", "evaluate:", "phase stats"))
        ))
        if rc != 0:
            log(f"[e2e] FAILED rc={rc}: {out[-500:]}")
    except Exception as e:  # noqa: BLE001
        log(f"[e2e] skipped: {e}")


def wait_for_device(budget_s: float) -> bool:
    """Probe the TPU in a SUBPROCESS until it answers or the budget
    expires. The axon tunnel has measured multi-hour outages
    (RuntimeError UNAVAILABLE at backend init, or init hanging); a
    failed backend init is cached for the probing process's lifetime,
    so each attempt must be a fresh process. SIGTERM+grace on hangs — a
    process that never finished device init holds no in-flight compile
    to wedge the tunnel with."""
    import subprocess

    if budget_s <= 0:
        return True  # explicit opt-out: no probe, no extra init
    deadline = time.time() + budget_s
    attempt = 0
    # Init + a raw transfer ONLY — no jit, no matmul: the probe must
    # never be killed mid-remote-COMPILE (that wedges the tunnel for the
    # next process, CLAUDE.md); killing a process stuck in backend init
    # or a plain device_put holds no compiler state.
    probe_src = (
        "import jax, numpy as np;"
        "x = jax.device_put(np.arange(8.0));"
        "assert float(np.asarray(x).sum()) == 28.0"
    )
    while True:
        attempt += 1
        proc = subprocess.Popen([sys.executable, "-c", probe_src])
        try:
            rc = proc.wait(timeout=240)
        except subprocess.TimeoutExpired:
            proc.terminate()
            try:
                rc = proc.wait(timeout=30)
            except subprocess.TimeoutExpired:
                proc.kill()
                proc.wait()  # reap — no zombie per killed attempt
                rc = -9
        if rc == 0:
            log(f"[setup] device probe ok (attempt {attempt})")
            return True
        if time.time() >= deadline:
            log(
                f"[setup] device still unavailable after {attempt} probes "
                f"/ {budget_s:.0f}s; giving up (caller emits error JSON)"
            )
            return False
        log(f"[setup] device unavailable (probe rc={rc}); retrying in 60s")
        time.sleep(60)


def main() -> None:
    t_start = time.time()
    watchdog_s = float(os.environ.get("HBIRD_BENCH_WATCHDOG", 1500.0))
    watchdog_deadline = t_start + watchdog_s
    arm_watchdog(watchdog_deadline)

    platform_override = os.environ.get("HBIRD_BENCH_PLATFORM", "")
    on_cpu = platform_override.split(",")[0].strip().lower() == "cpu"
    if not os.environ.get("HBIRD_BENCH_SMOKE") and not on_cpu:
        # The wait budget must leave room to emit + exit before the
        # watchdog; never walk into in-process jax init on a dead device
        # (BENCH_r03: that hang produced rc=124 / parsed=null). A CPU
        # platform override needs no TPU at all — skip the probe.
        init_wait = float(os.environ.get("HBIRD_BENCH_INIT_WAIT", 1200.0))
        wait_budget = min(init_wait, watchdog_deadline - time.time() - 120.0)
        if init_wait > 0:
            # A tight watchdog must shrink the probe budget, not void it:
            # budget <= 0 means "skip the probe" inside wait_for_device,
            # which would walk straight into a hangable in-process init.
            wait_budget = max(wait_budget, 60.0)
        if not wait_for_device(wait_budget):
            emit(0.0, error="device unreachable: all probes failed "
                            f"within {wait_budget:.0f}s")
            log("[setup] device never answered — error record emitted, "
                "exiting without touching in-process jax")
            return

    import jax

    # The axon sitecustomize force-overrides platform selection at import
    # time (JAX_PLATFORMS env is ignored); an explicit post-import config
    # update is the only way to run the smoke/emission-contract check on
    # CPU without touching the tunnel.
    if os.environ.get("HBIRD_BENCH_PLATFORM"):
        jax.config.update(
            "jax_platforms", os.environ["HBIRD_BENCH_PLATFORM"]
        )

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    dev = jax.devices()[0]
    log(f"device: {dev}")

    # Generate ON DEVICE: host-side generation + the ~1.6 GB tunnel
    # upload measured 400-650s of setup on this 1-core host — time that
    # must not eat the driver's budget. On-device it is one tiny compile
    # + milliseconds of PRNG.
    import functools

    @functools.partial(jax.jit, static_argnums=(1, 2))
    def gen(key, n, m):
        x = jax.random.normal(key, (n, m), jnp.float32)
        return (x / jnp.linalg.norm(x, axis=1, keepdims=True)).astype(
            jnp.bfloat16
        )

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    bank_bf16 = gen(k1, M_ROWS, D)
    q_bf16 = gen(k2, Q_N, D)
    _force(bank_bf16[:1])
    _force(q_bf16[:1])
    rng = np.random.default_rng(0)  # diagnostics' host-side draws
    log(f"[setup] data generated on-device in {time.time()-t_start:.0f}s")

    # The headline must land before the watchdog fires; leave it 60s of
    # emission headroom.
    deadline = min(
        time.time() + HEADLINE_DEADLINE_S, watchdog_deadline - 60.0
    )
    qps, measured, still_pending = measure_headline(q_bf16, bank_bf16, deadline)

    emit(qps, error=None if qps > 0 else "no ladder rung measured")
    log(f"[headline] {qps:,.0f} q/s/chip via "
        f"{max(measured, key=measured.get) if measured else 'NONE'} "
        f"(all: { {k: round(v) for k, v in measured.items()} }) "
        f"after {time.time()-t_start:.0f}s")

    if os.environ.get("HBIRD_BENCH_SMOKE"):
        log("[smoke] JSON emitted; skipping diagnostics")
    else:
        diagnostics(q_bf16, bank_bf16, measured, rng)

    # Exiting while an abandoned compile thread is mid-TPU-operation
    # wedges the remote tunnel for the NEXT process (observed round 3);
    # drain them within a bounded grace before returning — in smoke mode
    # too (a smoke run on the real device can still abandon a compile).
    grace = float(os.environ.get("HBIRD_BENCH_EXIT_GRACE", 900.0))
    t0 = time.time()
    for v in still_pending:
        v.wait(max(0.0, grace - (time.time() - t0)))


if __name__ == "__main__":
    main()
