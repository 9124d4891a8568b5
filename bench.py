#!/usr/bin/env python
"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Methodology (settled round 7):
- Forcing: bit_xor(xxhash64(*all_columns)) per slot — consumes every
  output column. Rounds 1-5 forced with count(), which let Catalyst
  prune unreferenced columns, so text-transform slots under-reported;
  r6+ numbers are like-for-like with each other but NOT with r1-r5.
- Median-of-3: each slot runs SPARK_GRAFT_BENCH_REPS times (default 3)
  after the codegen warm-up; `queries` carries the per-slot MEDIAN and
  `query_spreads` the {median,min,max,n} band, so a one-rep scheduler
  hiccup cannot masquerade as a round-over-round regression.
- Ambient-stall resistance (settled round 9 — BENCH_r08 was poisoned
  by host contention that inflated two slots 2.5-6x): wall-clock noise
  on a shared box is ONE-SIDED (a stall only ever ADDS time), so a
  slot whose median/min exceeds SPARK_GRAFT_BENCH_STALL_RATIO
  (default 2.0) gets up to SPARK_GRAFT_BENCH_EXTRA_REPS (default 2)
  re-runs before recording — calm reps pull the median back to the
  intrinsic cost. If the ratio STILL exceeds the bound after the
  extra reps, the slot is listed in `contaminated_slots` and the
  payload carries `"contaminated": true` — such a record must not be
  used for round-over-round claims. `/proc/loadavg` is sampled before
  and after the run (`loadavg_before`/`loadavg_after`) so a loaded
  machine is visible in the record itself.
- Uniform-ambient-load gate (settled round 10 — two r9 judge runs
  passed the one-sided stall check while 15-40% inflated by
  post-suite residual load): the record is stamped
  `"ambient_load": true` + `ambient_load_reasons` when the 5-min
  loadavg at start exceeds SPARK_GRAFT_BENCH_MAX_LOADAVG (default
  0.3) or when the legacy-comparable subtotal lands outside the
  pinned quiet-machine band in bench_baseline.json. An ambient-loaded
  record is emitted (the driver still gets data) but is NOT usable
  for round-over-round claims.
- Self-normalization (settled round 12 — three of four r11-era runs
  self-flagged ambient_load with UNIFORM ~1.5-1.9x inflation on every
  slot, leaving the round zero adjudicable latency evidence: the gate
  detected the load but discarded the data): a fixed, pure-CPU,
  Spark-free calibration workload (threaded sha256 over a pinned byte
  volume — hashlib releases the GIL, so it saturates cores the way a
  Spark stage does) is timed before AND after the sweep; its
  quiet-machine cost is pinned in bench_baseline.json
  (`calibration_quiet_sec`). The correction ratio is the MIN of the
  two side-medians over the pin — conservative by construction: load
  present on only one side (a ramp-down, or a late spike — observed
  over-correcting the first live run BELOW the band) did not act on
  the slots for the whole sweep, and an over-correction could hide a
  real regression, while an under-correction just leaves the record
  flagged. The payload carries `calibration` (raw runs + ratio vs the
  pin) and `normalized_ratios` (per-slot median/pinned-min divided by
  the calibration ratio). On a uniformly loaded host every slot's
  normalized ratio stays ~1 and
  `normalized_legacy_subtotal` lands back inside the pinned band —
  an adjudicable record despite the load — while a real single-slot
  plan regression shows up as ONE slot's normalized ratio diverging.
  Raw numbers stay authoritative on a quiet machine; normalized
  numbers are the fallback comparison channel, never a substitute
  when both are clean.
- Additive-load detection + heavy-slot adjudication (settled round 14
  — the r13 driver record was inadjudicable with a STABLE calibration:
  sub-second slots at 3.3-4.4x their pins while multi-second slots sat
  at 1.0-1.6x, an ADDITIVE per-slot overhead no multiplicative scalar
  represents): `inflation_profile` splits per-slot inflation by pin
  size and stamps `ambient_additive: true` (normalized fields
  suppressed via `normalized_unreliable`) when the small-slot median
  inflation exceeds 2x the large-slot median. `heavy_subtotal` — the
  sum over >=1s-pinned slots, with its own one-sided band in
  bench_baseline.json — is the PRIMARY loaded-host adjudication
  number: additive jitter that can quadruple a 0.2s slot moves the
  multi-second-slot sum by only a bounded fraction. The correction
  ratio is CAPPED at the observed large-slot median inflation
  (calibration is pure CPU; Spark wall time is not — an uncapped 2.43x
  correction on a slower-CPU host normalized the r13 judge run below
  physical reality). After the full payload line the bench prints one
  compact final `{"headline": ...}` line repeating every adjudication
  fact (raw/heavy subtotals + bands, ambient/additive/contaminated
  flags, calibration ratios, n_failed) so a fixed-size tail of the
  output — the driver keeps ~2000 chars — still carries them.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from llm_enhanced_data_pipeline_spark.queries import REGISTRY  # noqa: E402
from llm_enhanced_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM_SF_DIR = os.environ.get("SPARK_GRAFT_WARM_SF_DIR", "/root/testdata/sf0.001")
REPS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
#: a slot whose median/min exceeds this after all reps is stall-poisoned
STALL_RATIO = float(os.environ.get("SPARK_GRAFT_BENCH_STALL_RATIO", "2.0"))
#: extra recovery reps granted to a stall-suspect slot
MAX_EXTRA_REPS = max(0, int(os.environ.get("SPARK_GRAFT_BENCH_EXTRA_REPS", "2")))
#: 5-minute loadavg at start above which the record is stamped
#: ambient-loaded. The per-slot median/min stall check is one-sided:
#: UNIFORM background load (e.g. the test suite's residual JVMs)
#: shifts median and min together, so two r9 judge runs passed
#: contaminated=false while 15-40% inflated — with loadavg_before
#: 0.62/0.91 sitting unused in their own payloads. This closes that
#: hole: the signal gates the record, not just decorates it.
AMBIENT_LOAD_MAX = float(os.environ.get("SPARK_GRAFT_BENCH_MAX_LOADAVG", "0.3"))

#: calibration workload: MiB hashed per thread (sha256 over a zero
#: buffer — deterministic, allocation-free after setup, GIL-released)
CALIB_MB = int(os.environ.get("SPARK_GRAFT_BENCH_CALIB_MB", "768"))
#: calibration threads — matches the Spark-stage parallelism shape so
#: uniform external load inflates calibration and slots alike
CALIB_THREADS = int(
    os.environ.get(
        "SPARK_GRAFT_BENCH_CALIB_THREADS", str(min(32, os.cpu_count() or 8))
    )
)
#: calibration reps per side (before/after the sweep)
CALIB_REPS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_CALIB_REPS", "3")))


def calibration_run(mb_per_thread: int | None = None) -> float:
    """Wall-seconds for the fixed calibration workload: CALIB_THREADS
    threads each sha256-hashing ``mb_per_thread`` MiB of zeros in 1 MiB
    updates. hashlib releases the GIL for >2 KiB updates, so the
    threads genuinely run in parallel and the workload contends for
    CPU exactly like a whole-stage-codegen Spark stage — uniform
    ambient load slows it by the same factor it slows the slots. No
    Spark, no allocation in the loop, no I/O: the ONLY variable is the
    machine."""
    import hashlib
    import threading

    mb = CALIB_MB if mb_per_thread is None else mb_per_thread
    buf = bytes(1 << 20)

    def work() -> None:
        h = hashlib.sha256()
        for _ in range(mb):
            h.update(buf)
        h.digest()

    threads = [threading.Thread(target=work) for _ in range(CALIB_THREADS)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return time.perf_counter() - t0


def load_baseline() -> dict:
    """bench_baseline.json next to this file, or {} when absent."""
    try:
        with open(
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "bench_baseline.json",
            )
        ) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return {}


#: a slot whose pinned quiet cost is at least this many seconds is
#: "heavy": per-slot additive jitter (~0.1-2s of scheduler contention)
#: moves it by a bounded FRACTION, unlike a 0.2s slot it can inflate 4x
HEAVY_PIN_CUTOFF = 1.0


def inflation_profile(
    timings: dict[str, float],
    slots_sec: dict[str, float],
    cutoff: float = HEAVY_PIN_CUTOFF,
) -> dict:
    """Per-slot inflation (median / pinned-min) split by pin size —
    the ADDITIVE-load detector (settled round 14; the driver's r13
    record was inadjudicable with a STABLE calibration because
    sub-second slots sat at 3.3-4.4x their pins while multi-second
    slots sat at 1.0-1.6x). A multiplicative slowdown (slow CPU,
    uniform load) inflates small and large slots by the SAME factor;
    an additive per-slot overhead (scheduling contention adding ~1-2s
    to every slot) inflates small slots far MORE than large ones. When
    the small-slot median inflation exceeds 2x the large-slot median
    inflation (and is itself > 1.5 — a quiet host where both medians
    sit near 1.0 can never trip on ratio noise alone), the record is
    stamped ``ambient_additive`` and no scalar correction applies:
    the normalized fields are suppressed the same way an unstable
    calibration suppresses them."""
    ratios = {
        k: v / slots_sec[k]
        for k, v in timings.items()
        if k in slots_sec and slots_sec[k] > 0
    }
    small = [v for k, v in ratios.items() if slots_sec[k] < cutoff]
    large = [v for k, v in ratios.items() if slots_sec[k] >= cutoff]
    out: dict = {"ambient_additive": False}
    if small:
        out["small_slot_median_ratio"] = round(statistics.median(small), 3)
    if large:
        out["large_slot_median_ratio"] = round(statistics.median(large), 3)
    if small and large and out["large_slot_median_ratio"] > 0:
        divergence = (
            out["small_slot_median_ratio"] / out["large_slot_median_ratio"]
        )
        out["small_vs_large_divergence"] = round(divergence, 3)
        out["ambient_additive"] = bool(
            divergence > 2.0 and out["small_slot_median_ratio"] > 1.5
        )
    return out


def heavy_subtotal_fields(
    timings: dict[str, float],
    errors: dict[str, str],
    baseline: dict,
    cutoff: float = HEAVY_PIN_CUTOFF,
) -> dict:
    """The >=1s-pinned-slot subtotal and its own band — the PRIMARY
    loaded-host adjudication number (settled round 14): additive
    per-slot jitter that can quadruple a 0.2s slot moves a 25s
    subtotal of multi-second slots by only a bounded fraction, so this
    band stays adjudicable exactly when the legacy band (which mixes
    ten sub-second slots) drowns in contention. One-sided like the
    legacy check: only the ceiling signals regression."""
    slots = baseline.get("slots_sec") or {}
    heavy_names = {k for k, v in slots.items() if v >= cutoff}
    if not heavy_names or not heavy_names <= set(timings):
        return {}
    if heavy_names & set(errors):
        return {}
    subtotal = round(sum(timings[k] for k in heavy_names), 4)
    out = {"heavy_subtotal": subtotal, "heavy_slot_count": len(heavy_names)}
    band = baseline.get("heavy_subtotal_band")
    if band:
        out["heavy_band"] = band
        out["heavy_in_band"] = bool(subtotal <= band[1])
        out["heavy_below_band"] = bool(subtotal < band[0])
    return out


def normalize_record(
    timings: dict[str, float],
    legacy_total: float | None,
    calib_ratio: float | None,
    baseline: dict,
    calib_unstable: bool = False,
    ambient_additive: bool = False,
) -> dict:
    """Load-normalized comparison fields for the payload (empty dict
    when no calibration ratio or no pins are available — the record
    then degrades to raw-only, exactly the pre-r12 shape).

    ``normalized_ratios[slot] = (median / pinned_min) / calib_ratio``:
    ~1 means the slot costs what the pin says once the machine's
    measured slowdown is divided out. A UNIFORM load cancels (every
    slot and the calibration inflate together); a genuine plan
    regression survives normalization as one slot's ratio diverging
    from its siblings. ``normalized_legacy_subtotal`` re-checks the
    quiet-machine band after dividing out the slowdown — the
    adjudication number for a loaded host.

    Latency noise on a shared box is ONE-SIDED (load only ever ADDS
    time), so ``normalized_in_band`` checks only the CEILING: a
    subtotal above band[1] after normalization is a credible
    regression signal. A subtotal BELOW band[0] is a speedup or band
    staleness — the r12 driver record (fastest subtotal on file,
    9.31s) read ``normalized_in_band: false`` under the old two-sided
    check purely for being fast. That case now stays in-band and is
    flagged ``normalized_below_band`` (informational: consider
    re-pinning the band from the new clean evidence).

    When ``calib_unstable`` (the before/after calibration medians
    disagree >2x — load arrived or left MID sweep), no single scalar
    can normalize the record: different slots saw different machines.
    The normalized fields are then SKIPPED entirely and the payload
    carries ``normalized_unreliable: true`` instead, so a consumer
    reading only ``normalized_in_band`` can never adjudicate a record
    whose own calibration disavows the correction.

    ``ambient_additive`` (small-slot inflation >2x the large-slot
    inflation — see :func:`inflation_profile`) suppresses the
    normalized fields for the same reason: an additive per-slot
    overhead is not representable by ANY multiplicative scalar, so a
    "normalized" subtotal under it is noise wearing a unit.

    Both suppression checks run BEFORE the missing-ratio early return:
    a record with unstable calibration AND a missing/zero ratio must
    still carry the 'calibration disavows this record' marker (r13
    ADVICE)."""
    out: dict = {}
    if calib_unstable or ambient_additive:
        return {"normalized_unreliable": True}
    if not calib_ratio or calib_ratio <= 0:
        return out
    slots = baseline.get("slots_sec") or {}
    ratios = {
        k: round((v / slots[k]) / calib_ratio, 3)
        for k, v in timings.items()
        if k in slots and slots[k] > 0
    }
    if ratios:
        out["normalized_ratios"] = ratios
    band = baseline.get("legacy_13slot_subtotal_band")
    if band and legacy_total is not None:
        norm = round(legacy_total / calib_ratio, 4)
        out["normalized_legacy_subtotal"] = norm
        out["normalized_in_band"] = bool(norm <= band[1])
        out["normalized_below_band"] = bool(norm < band[0])
    return out


#: the round-over-round comparable slot set (see main(): rounds 1-5
#: benched these 13 queries plus the split-out shared index build)
LEGACY_SLOT_NAMES = frozenset({
    "cosine_topk", "decontamination_report", "enrichment_join_5way",
    "events_asof_join", "events_hourly_rollup", "flagship_pipeline",
    "ivf_knn", "near_dup_pairs_minhash", "q1_pricing_summary",
    "q3_shipping_priority", "q5_region_revenue", "text_clean_chain",
    "training_data_pipeline", "shared_minhash_index_build",
})


def ambient_load_reasons(
    loadavg_before: list[float] | None,
    timings: dict[str, float],
    errors: dict[str, str],
    legacy_names: set[str],
) -> list[str]:
    """Why this record must not back round-over-round claims (empty =
    usable). Two independent detectors for uniform ambient load the
    one-sided stall check cannot see:

    1. the 5-min loadavg sampled BEFORE the run exceeds
       ``AMBIENT_LOAD_MAX`` — work was already running on the box;
    2. the legacy-comparable subtotal lands OUTSIDE the pinned
       quiet-machine band in ``bench_baseline.json`` (checked only
       when every legacy slot actually ran — partial/synthetic slot
       sets have no meaningful subtotal; an error in a NON-legacy
       slot does not exempt the check, since all 14 legacy timings
       are still present and comparable). A BELOW-band subtotal is
       flagged too: it means either a real plan improvement (re-pin
       the band) or a measurement artifact — either way not a number
       to quote silently against the old band.
    """
    reasons: list[str] = []
    if loadavg_before is not None and len(loadavg_before) >= 2:
        if loadavg_before[1] > AMBIENT_LOAD_MAX:
            reasons.append(
                f"5-min loadavg at start {loadavg_before[1]:.2f} > "
                f"{AMBIENT_LOAD_MAX} (machine not quiet)"
            )
    if legacy_names <= set(timings) and not (legacy_names & set(errors)):
        try:
            lo, hi = load_baseline()["legacy_13slot_subtotal_band"]
        except (KeyError, ValueError):
            return reasons
        subtotal = sum(v for k, v in timings.items() if k in legacy_names)
        if not lo <= subtotal <= hi:
            reasons.append(
                f"legacy subtotal {subtotal:.2f}s outside the pinned "
                f"quiet-machine band [{lo}, {hi}]"
            )
    return reasons


def read_loadavg() -> list[float] | None:
    """1/5/15-minute load averages, or None off-Linux."""
    try:
        with open("/proc/loadavg") as fh:
            return [float(x) for x in fh.read().split()[:3]]
    except (OSError, ValueError):
        return None


def run_slot(run_rep) -> list[float]:
    """Time ``run_rep(i)`` REPS times; when the spread screams ambient
    stall (median/min > STALL_RATIO — noise on this box is one-sided,
    a host hiccup only ever ADDS time), grant up to MAX_EXTRA_REPS
    recovery reps so calm runs can pull the median back to the slot's
    intrinsic cost. Returns every rep; the caller records median and
    flags slots whose final ratio still exceeds the bound."""
    secs = [run_rep(i) for i in range(REPS)]
    extra = 0
    while (
        len(secs) >= 2
        and statistics.median(secs) / max(min(secs), 1e-9) > STALL_RATIO
        and extra < MAX_EXTRA_REPS
    ):
        secs.append(run_rep(REPS + extra))
        extra += 1
    return secs


def slot_is_contaminated(secs: list[float]) -> bool:
    return (
        len(secs) >= 2
        and statistics.median(secs) / max(min(secs), 1e-9) > STALL_RATIO
    )


def main() -> None:
    loadavg_before = read_loadavg()
    # calibration BEFORE the JVM exists: the pre-sweep runs measure the
    # machine the sweep is about to start on
    calib_before = [round(calibration_run(), 4) for _ in range(CALIB_REPS)]
    spark = get_spark("bench")
    bench_specs = sorted(
        (s for s in REGISTRY.values() if s.bench), key=lambda s: s.name
    )
    def force(df) -> None:
        """Force FULL execution including every output column. A bare
        count() lets Catalyst prune unreferenced columns, so row-level
        transforms (substring_dedup_apply's clean_text, text_clean
        chains) were silently benched without their actual work.
        bit_xor over a row hash genuinely consumes every column while
        keeping the query's own plan (AQE, sort/limit shortcuts)
        intact. Rejected alternatives, both measured: a noop-sink
        write distorts final-stage shapes by up to 7x on aggregates;
        count(xxhash64(cols)) gets optimized to count(*) because the
        hash is non-nullable, silently restoring the pruning."""
        from pyspark.sql import functions as F

        df.select(
            F.bit_xor(F.xxhash64(*[F.col(c) for c in df.columns])).alias("h")
        ).collect()


    # Warm-up pass: run every benched query once at the smallest scale
    # factor so whole-stage-codegen compilation (plan-shape dependent,
    # data-size independent) happens OUTSIDE the timed runs. Cold-start
    # JIT is ~70-85% of a one-shot run at sf0.1 and is irrelevant at
    # production scale, where each compiled plan runs for hours.
    warm_t0 = time.perf_counter()
    for spec in bench_specs:
        try:
            force(spec.fn(spark, WARM_SF_DIR))  # warm the SAME plan shape
        except Exception as exc:  # warm-up failure must not kill the bench
            print(f"# warm-up {spec.name} failed: {exc}", file=sys.stderr)
    print(
        f"# warm-up pass ({len(bench_specs)} plans at {WARM_SF_DIR}): "
        f"{time.perf_counter() - warm_t0:.1f}s",
        file=sys.stderr,
    )
    # warm-up runs at sf0.001 persist sf0.001-keyed intermediates —
    # release them (the memoized sf0.1 index is built fresh below)
    from llm_enhanced_data_pipeline_spark.operators import dedup as _dedup_warm

    _dedup_warm.release_caches()

    reps: dict[str, list[float]] = {}
    errors: dict[str, str] = {}

    def record(name: str, secs: list[float]) -> None:
        reps[name] = secs
        med = statistics.median(secs)
        print(
            f"# {name}: {med:.3f}s (median of {len(secs)}; "
            f"min {min(secs):.3f} max {max(secs):.3f})",
            file=sys.stderr,
        )

    # The shared MinHash signature/pair index (memoized per (session,
    # sf_dir)) serves several headline queries. Build it as its OWN
    # timed slot BEFORE the per-query loop so each consumer measures
    # its marginal cost — otherwise the build lands on whichever
    # consumer runs first and a real regression in the minhash path
    # hides inside run-order attribution noise. Between reps the memo
    # is invalidated so every rep is a cold build; the LAST build is
    # left live for the consumer slots.
    from llm_enhanced_data_pipeline_spark.queries import dedup_q

    if any(s.name in dedup_q.SHARED_MINHASH_CONSUMERS for s in bench_specs):
        def _minhash_rep(i: int) -> float:
            if i:
                dedup_q.invalidate_shared_minhash_index(spark, SF_DIR)
            t0 = time.perf_counter()
            dedup_q.build_shared_minhash_index(spark, SF_DIR)
            return time.perf_counter() - t0

        try:
            record("shared_minhash_index_build", run_slot(_minhash_rep))
        except Exception as exc:
            errors["shared_minhash_index_build"] = (
                f"{type(exc).__name__}: {exc}"[:500]
            )
            print(
                f"# shared_minhash_index_build: ERROR "
                f"{errors['shared_minhash_index_build']}",
                file=sys.stderr,
            )
    # Per-rep cache scoping: queries that persist intermediates
    # (persist_tracked / localCheckpoint) would otherwise serve reps
    # 2..N from rep 1's cache — Spark's CacheManager matches persisted
    # frames by analyzed-plan equality — and the median would report
    # warm-cache cost while the real cold build cost hides in the max.
    # Releasing everything a rep registered makes every rep cold; the
    # shared MinHash index (registered before any mark) stays live.
    from llm_enhanced_data_pipeline_spark.operators import dedup as _dedup

    for spec in bench_specs:
        def _query_rep(_i: int, _spec=spec) -> float:
            # finally: a rep that RAISES must still release what it
            # persisted — otherwise the orphaned frames hold executor
            # memory and can warm later slots sharing plan prefixes.
            mark = _dedup.cache_mark()
            try:
                t0 = time.perf_counter()
                force(_spec.fn(spark, SF_DIR))  # all columns, distributed
                return time.perf_counter() - t0
            finally:
                _dedup.release_caches_since(mark)

        try:
            secs = run_slot(_query_rep)
        except Exception as exc:
            # One broken query must not zero the whole round's bench:
            # record the error, keep timing the rest.
            errors[spec.name] = f"{type(exc).__name__}: {exc}"[:500]
            print(f"# {spec.name}: ERROR {errors[spec.name]}", file=sys.stderr)
            continue
        record(spec.name, secs)

    # calibration AFTER the sweep: residual load that built up during
    # the run (the r9/r11 post-suite JVM pattern) shows up as a
    # before/after spread; the ratio uses the median of ALL runs
    calib_after = [round(calibration_run(), 4) for _ in range(CALIB_REPS)]
    baseline = load_baseline()
    calib_quiet = baseline.get("calibration_quiet_sec")
    calib_median = round(statistics.median(calib_before + calib_after), 4)
    # The correction ratio is the MIN of the two side-medians: load
    # that appears only before (ramping down) or only after (a late
    # spike, post-sweep residual JVMs) did not act on the slots for
    # the whole sweep, and the first live run showed exactly that —
    # an after-side spike over-corrected the legacy subtotal BELOW
    # the band. min() makes normalization conservative: it can
    # UNDERstate the correction (record stays flagged, nothing
    # hidden) but never overstate it (which could normalize a real
    # regression away). Under genuinely uniform load (the r11
    # scenario) both sides agree and min() changes nothing.
    calib_side = round(
        min(statistics.median(calib_before), statistics.median(calib_after)),
        4,
    )
    calib_ratio = (
        round(calib_side / calib_quiet, 4)
        if calib_quiet and calib_side > 0
        else None
    )
    # When the two sides disagree wildly (load arrived or left MID
    # sweep — observed: before ~quiet, after 10x), no single scalar can
    # normalize the record: different slots experienced different
    # machines. Flag it so the normalized channel is read as unreliable
    # for this record rather than merely conservative.
    calib_unstable = bool(
        statistics.median(calib_before) > 0
        and statistics.median(calib_after) > 0
        and max(statistics.median(calib_before), statistics.median(calib_after))
        / min(statistics.median(calib_before), statistics.median(calib_after))
        > 2.0
    )
    print(
        f"# calibration: before {calib_before} after {calib_after} "
        f"side-min {calib_side}s (median-all {calib_median}s) "
        f"quiet-pin {calib_quiet}s ratio {calib_ratio} "
        f"unstable {calib_unstable}",
        file=sys.stderr,
    )

    timings = {k: round(statistics.median(v), 4) for k, v in reps.items()}
    # A failed query means the headline total covers FEWER queries than
    # previous rounds — a partial sum would read as a fake speedup. Null
    # the headline value whenever anything failed; per-query timings and
    # n_failed keep the surviving data comparable.
    total = round(sum(timings.values()), 4) if not errors else None
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    # Round-over-round comparability: rounds 1-5 benched a 13-query set
    # with the shared minhash build inside near_dup_pairs_minhash's
    # slot. The 15-slot total above adds corpus_build_v4 +
    # substring_dedup_apply; this subtotal (legacy 13 + the split-out
    # build) diffs against BENCH_r06's value (r1-r5 used count()
    # forcing — see module docstring — so they are NOT like-for-like).
    legacy_names = LEGACY_SLOT_NAMES
    legacy_total = round(
        sum(v for k, v in timings.items() if k in legacy_names), 4
    )
    contaminated_slots = sorted(
        k for k, v in reps.items() if slot_is_contaminated(v)
    )
    load_reasons = ambient_load_reasons(
        loadavg_before, timings, errors, legacy_names
    )
    profile = inflation_profile(timings, baseline.get("slots_sec") or {})
    # Cap the correction ratio at the observed large-slot median
    # inflation (settled round 14): the calibration workload is pure
    # CPU, but Spark wall time is not — on a genuinely slower-CPU host
    # the judge's r13 run measured calibration 2.43x while the slots
    # ran only 1.1-2.1x, and dividing by the full 2.43 pushed the
    # normalized subtotal below physical reality. The large-slot
    # median is the most load-robust direct observation of how much
    # the SLOTS actually slowed; the correction may never exceed it
    # (floored at 1.0 so a fast host is never "corrected" upward).
    calib_ratio_capped = calib_ratio
    large_median = profile.get("large_slot_median_ratio")
    if calib_ratio and large_median:
        calib_ratio_capped = round(
            min(calib_ratio, max(1.0, large_median)), 4
        )
    payload = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "n_failed": len(errors),
        "reps_per_slot": REPS,
        "stall_ratio": STALL_RATIO,
        "contaminated": bool(contaminated_slots),
        "contaminated_slots": contaminated_slots,
        "ambient_load": bool(load_reasons),
        "ambient_load_reasons": load_reasons,
        "ambient_load_max": AMBIENT_LOAD_MAX,
        "loadavg_before": loadavg_before,
        "loadavg_after": read_loadavg(),
        "forcing": "bit_xor(xxhash64(*cols)) since r6; r1-r5 count() "
        "forcing column-pruned and is not comparable",
        "legacy_13slot_total": legacy_total if not errors else None,
        "calibration": {
            "before_secs": calib_before,
            "after_secs": calib_after,
            "median_sec": calib_median,
            "side_min_sec": calib_side,
            "unstable": calib_unstable,
            "quiet_sec": calib_quiet,
            "ratio": calib_ratio,
            "ratio_capped": calib_ratio_capped,
            "threads": CALIB_THREADS,
            "mb_per_thread": CALIB_MB,
        },
        "inflation_profile": profile,
        "ambient_additive": profile.get("ambient_additive", False),
        "queries": timings,
        "query_spreads": {
            k: {
                "median": round(statistics.median(v), 4),
                "min": round(min(v), 4),
                "max": round(max(v), 4),
                "n": len(v),
            }
            for k, v in reps.items()
        },
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    payload.update(heavy_subtotal_fields(timings, errors, baseline))
    payload.update(
        normalize_record(
            timings,
            legacy_total if legacy_names <= set(timings) else None,
            calib_ratio_capped,
            baseline,
            calib_unstable=calib_unstable,
            ambient_additive=profile.get("ambient_additive", False),
        )
    )
    if errors:
        payload["errors"] = errors
        payload["partial_total"] = round(sum(timings.values()), 4)
    if contaminated_slots:
        print(
            "# WARNING: ambient-stall contamination survived the recovery "
            f"reps on {contaminated_slots} (median/min > {STALL_RATIO}); "
            "this record must NOT be used for round-over-round claims — "
            "re-run on a quiet machine.",
            file=sys.stderr,
        )
    if load_reasons:
        print(
            "# WARNING: ambient load detected — "
            + "; ".join(load_reasons)
            + ". The per-slot stall check cannot see UNIFORM load; raw "
            "numbers must NOT back round-over-round claims — use the "
            "normalized_ratios / normalized_legacy_subtotal channel "
            "(calibration-corrected) or re-run on a quiet machine.",
            file=sys.stderr,
        )
    print(json.dumps(payload))
    # Truncation-proof PER-SLOT medians (settled round 15): the r14
    # headline line restored the adjudication facts to the driver's
    # ~2000-char tail, but the per-query medians still lived only in
    # the full payload line, so the driver's round-over-round and
    # scaling comparisons came back empty. This compact second line
    # (~700 chars for 25 slots at 2dp) plus the headline line (~450
    # chars) both fit inside any 2000-char tail. 2dp is deliberate:
    # plenty for adjudication, small enough to never crowd out the
    # headline that follows.
    print(json.dumps({"medians": {k: round(v, 2) for k, v in timings.items()}}))
    # Truncation-proof adjudication tail (settled round 14): the
    # driver keeps only the LAST ~2000 chars of this output, and the
    # r13 record lost its raw subtotal/calibration/ambient flags to
    # that cut. This compact final line repeats every adjudication
    # fact so any fixed-size tail of the stream still carries them.
    print(
        json.dumps(
            {
                "headline": {
                    "raw_subtotal": payload.get("legacy_13slot_total"),
                    "band": baseline.get("legacy_13slot_subtotal_band"),
                    "heavy_subtotal": payload.get("heavy_subtotal"),
                    "heavy_band": payload.get("heavy_band"),
                    "heavy_in_band": payload.get("heavy_in_band"),
                    "ambient_load": payload["ambient_load"],
                    "ambient_additive": payload["ambient_additive"],
                    "contaminated": payload["contaminated"],
                    "calib_ratio": calib_ratio,
                    "calib_ratio_capped": calib_ratio_capped,
                    "normalized_subtotal": payload.get(
                        "normalized_legacy_subtotal"
                    ),
                    "normalized_unreliable": payload.get(
                        "normalized_unreliable", False
                    ),
                    "n_failed": payload["n_failed"],
                }
            }
        )
    )
    spark.stop()
    if timings == {} and errors:
        sys.exit(1)  # non-zero only when EVERY query failed


if __name__ == "__main__":
    main()
