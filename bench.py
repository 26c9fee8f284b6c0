"""Benchmark harness. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Measures KG-extraction throughput at TWO parallelism levels — the
sandbox stand-in for the north rule's N vs 4N executor scaling — plus
headline query wall times at full configured parallelism.

Scaling methodology (why this shape):

This host is CPU-burst-throttled: a short window of full-speed
execution, then the clock is cut to a small sustained budget that
refills while idle (BASELINE.md "host characterization"). That creates
TWO speed regimes; a scaling ratio is only meaningful when both legs
are measured in the SAME regime. Designs that failed before this one:
sequential whole legs (driver round 1: one leg throttled mid-leg, eff
0.514), interleaved passes minutes apart (legs land in different
regimes; min/min produced spurious eff of 1.19-1.7 because a short
4-core pass can fit entirely inside a burst window while a long 1-core
pass cannot).

Current design (v6 — fully-overlapped WEAK-scaling legs):
 1. Both legs are persistent single-JVM servers: the small leg at N=1
    core over a corpus of P pages, the big leg at 4N=4 cores over 4P
    pages (same generator, 4x the size) — the standard two-cluster-size
    scaling criterion (Gustafson weak scaling: grow the data with the
    cluster). The measured job is the full extraction materialized
    through a single-stage noop sink (no shuffle, no sink cost).
 2. One ROUND runs ONE pass of each leg CONCURRENTLY. With perfect
    scaling the two walls are equal, so both legs are busy for the
    whole window and sample the IDENTICAL host-noise trajectory;
    hypervisor clock changes hit both legs at the same instant and
    cancel. Round efficiency = wall_small / wall_big =
    (thr_big / thr_small) / 4. Each leg's wall contains exactly ONE
    job submission + one task-dispatch wave, so fixed overhead is
    symmetric — unlike the earlier strong-scaling shape (big leg ran
    4 sequential passes of the SAME input), which charged per-pass
    overhead 4x to the big leg (efficiency bound (W+o)/(W+4o) ~ 0.89
    at W=7 s) and, once the host's burst budget drained mid-phase,
    collapsed into CFS fair-share noise (observed medians 0.752/0.771
    across 9-round runs with per-round values 0.59-1.04).
 3. The reported efficiency is the MEDIAN across rounds; every sample
    is included in the artifact. v7 addition: each round carries a
    REGIME witness — its small-leg wall vs the fastest small-leg wall
    observed in the run (the burst-regime reference). Rounds whose
    small wall is within 1.5x of that reference ran on a refilled
    burst budget ("burst"); slower rounds ran degraded ("drained",
    where CFS fair-sharing pins the overlapped ratio near 1.0
    regardless of code — BASELINE.md host characterization). The
    artifact reports the all-rounds median AND the burst-only median,
    and the headline uses the burst-only median whenever >= 2 burst
    rounds exist; per-round efficiencies > 1.05 are additionally
    flagged fairshare_suspect (unphysical for real 1->4-core scaling).
 4. Early stopping is VALUE-AGNOSTIC (no optional-stopping bias toward
    any target): sampling ends when the last 3 round efficiencies
    agree within +/-10% of their median — i.e. the measurement has
    stabilized — or at the hard wall-clock budget.
 5. Rounds are SMALL (~5 s of ~5-core demand, ~25 core-s — sized
    against the measured ~20-40 core-s the burst budget refills per
    40 s idle gap) so rounds run at full burst speed (a real
    dedicated-core comparison) instead of sliding into deep throttle,
    where CFS fair-sharing pins the ratio to ~1.0 regardless of code.
    Round 4 proved the economy is binding: a heavy-page tail doubled
    round demand and every round landed drained; round 5 moved the
    heavy pages out of the scaling legs (they stay in the headline
    corpus) and shrank the filler corpus to 2.5k pages/leg-core.
 6. A FROZEN witness (run_witness below) separates corpus growth from
    host regime in round-over-round headline comparisons.

The pair is N=1 vs 4N=4 cores — inside the sustained budget (above ~6
concurrent cores the hypervisor clock-cut dominates any code
property). Override with SPARK_GRAFT_SCALE_SMALL / SPARK_GRAFT_SCALE_BIG
on real hardware.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import select
import statistics
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SCALE_SMALL = int(os.environ.get("SPARK_GRAFT_SCALE_SMALL", "1"))
SCALE_BIG = int(os.environ.get("SPARK_GRAFT_SCALE_BIG", "4"))


def _sf_of(path: str) -> float:
    try:
        return float(Path(path).name.replace("sf", ""))
    except ValueError:
        return 0.1


SF = _sf_of(SF_DIR)
# pass sizing: the round must fit the host's burst-refill ECONOMY, not
# just its wall clock. A round demands ~5 concurrent cores for the
# pass duration; the budget refills only while idle (~20-40 core-s per
# 40 s gap). Measured failure modes: 8k-page small passes (~110
# core-s/round) outran the refill and walls ballooned 21 -> 58 s
# within 4 rounds, pinning the overlapped ratio to the CFS fair-share
# ceiling; the round-4 driver run kept 4k pages but added a heavy-page
# tail (one ~1.9 MB doc + one bnode-dense doc per leg-set) that
# doubled the burst small-leg wall 7.7 -> 16.3 s (~80 core-s/round) —
# every round landed drained and the burst-only median was empty.
# Round 5 therefore sizes a round for a real refill SURPLUS, not
# break-even: the first resize (2.5k pages ~ 27 core-s/round) measured
# 0.895 but every round still ran drained — 27 demand vs ~30 refill is
# marginal, so a phase that STARTS drained (after the headline phase)
# never recovers, and late rounds drift toward the fair-share ceiling
# (the 5th printed 1.126, flagged). 1.5k pages ~ 16 core-s/round
# leaves ~half the per-gap refill as surplus, so the budget recovers
# DURING the phase and rounds reach burst. NO heavy tail in the
# scaling legs (see _LEG_CODE below — the heavy pages stay in the
# headline corpus, where skew handling is what is being measured; the
# scaling legs need exact per-core proportionality and burst-economy
# sizing).
SCALE_CORPUS = max(512, int(SF * 15_000))
# settle between the 32-core headline phase and the scaling legs: 60 s
# proved too short — the headline phase drains the burst budget deeply
# and the round-4 full run's scaling rounds ALL started drained (walls
# 15-23 s vs the 8.3 s burst wall; median 1.045) while the same code
# on a rested budget printed 0.964 with zero suspect rounds. 180 s
# still left the round-5 validation run's first round drained; 240 s
# plus the per-round refill surplus (SCALE_CORPUS note) is what buys
# the phase its burst rounds.
COOLDOWN_START = int(os.environ.get("SPARK_GRAFT_BENCH_COOLDOWN", "240"))
# 8 s between rounds proved too short to refill the host's burst
# budget: a 9-round run degraded 0.83 -> 0.60 as the budget drained
# (round-3 validation), dragging the median under target while
# measuring the HOST, not the code. Round 3 ran 25 s gaps and STILL
# saw every measured round land in the drained regime (samples_small
# 11.8-23.7 s vs a 7.7 s burst wall); a round costs ~35-40 core-s
# against a refill of ~20-40 core-s per 25 s idle — marginal. 40 s
# gaps give the budget headroom so the burst-only median (the
# number that actually measures the code) exists most runs.
COOLDOWN_ROUND = int(os.environ.get("SPARK_GRAFT_BENCH_GAP", "40"))
MIN_ROUNDS = 5
MAX_ROUNDS = 8
# early-stop is VALUE-AGNOSTIC to avoid optional-stopping bias: sampling
# ends when the last 3 round efficiencies agree within +/-10% of their
# median (a stable regime), never because the number crossed a target.
# Round 2 ran with MIN_ROUNDS=3/TOL=0.2 and accepted [0.771, 0.74,
# 0.921] as "stable" with ~210 s of budget unused — the wider window
# discarded evidence that the host was still settling.
STABLE_WINDOW = 3
STABLE_TOL = 0.1
SCALING_BUDGET_S = int(os.environ.get("SPARK_GRAFT_SCALING_BUDGET", "300"))

_LEG_CODE = """
import json, sys, time
sys.path.insert(0, {repo!r})
from tortank_spark.session import get_spark
from tortank_spark import fixtures
from tortank_spark.extract import extract_triples, triples_only
import pyspark.sql.functions as F
spark = get_spark("bench-leg-{cpus}", cpus={cpus}, shuffle_partitions={cpus})
spark.sparkContext.setLogLevel("ERROR")
# 8 partitions per core: under the host's cgroup-period throttling a
# thread can stall mid-pass; fine-grained tasks let the remaining
# threads absorb the stall instead of the pass waiting on one
# straggler partition (task overhead ~10 ms is negligible vs ~0.5 s
# of parse work per partition)
# include_heavy=False: the scaling legs run a HOMOGENEOUS filler
# corpus. The heavy-page tail (one ~1.9 MB doc + one bnode-dense doc
# per set) belongs in the headline corpus where skew handling is
# measured; in the scaling legs it (a) doubled per-round core-s demand
# past the host's burst-refill budget (round-4: every round drained,
# burst-only median empty) and (b) puts an indivisible multi-second
# parse straggler on a 1-worker leg. Homogeneous filler keeps per-core
# work exactly proportional between the weak-scaling legs.
# Cache the PRUNED projection (url+text): the production path scans
# parquet with column pruning (plan-tested), so caching full rows
# would charge every pass an html-column decode the real pipeline
# never pays (~20% of the 1-core pass wall, measured)
pages = fixtures.make_pages(spark, n_pages={n_pages},
                            n_partitions=max(8 * {cpus}, 8),
                            include_broken=False,
                            include_heavy=False).select(
                                "url", "text").persist()
n_docs = pages.count()

def one_pass(df):
    # full extraction materialized through a single-stage noop sink:
    # every triple crosses Arrow back to the JVM, no shuffle, no sink
    t0 = time.monotonic()
    triples_only(extract_triples(df)).write.format("noop").mode(
        "overwrite").save()
    return time.monotonic() - t0

n_triples = triples_only(extract_triples(pages)).count()
w_wall = one_pass(pages)  # warmup: forks+imports python workers
print("META " + json.dumps({{"docs": n_docs, "triples": n_triples,
                             "warmup": round(w_wall, 3)}}), flush=True)
for line in sys.stdin:
    cmd = line.strip()
    if cmd == "GO":
        wall = one_pass(pages)
        print("PASS " + json.dumps(round(wall, 3)), flush=True)
    else:
        break
"""


import shutil

_TASKSET = shutil.which("taskset")


class Leg:
    """A persistent single-JVM extraction server at a fixed core count.

    ``cpu_list`` pins the whole leg (JVM + forked Python workers) to a
    DISJOINT core set via taskset. This removes the CFS fair-share
    coupling between overlapped legs: unpinned, the ~5 runnable
    threads of both legs share one runqueue and, once the host's burst
    budget drains, each gets an equal 1/5 share — which pins the
    overlapped ratio to ~1.0 (slightly above with the big JVM's helper
    threads) REGARDLESS of code, the round-3 fair-share ceiling. With
    disjoint affinity each leg's threads compete only within its own
    cores (intra-leg JVM-helper contention is proportionally identical
    on both sides and cancels in the ratio), while hypervisor clock
    cuts still hit both legs at the same instant and cancel."""

    def __init__(self, cpus: int, n_pages: int,
                 cpu_list: str | None = None):
        self.cpus = cpus
        code = _LEG_CODE.format(
            repo=str(Path(__file__).resolve().parent), cpus=cpus,
            n_pages=n_pages,
        )
        pin = [_TASKSET, "-c", cpu_list] if (_TASKSET and cpu_list) else []
        self.proc = subprocess.Popen(
            [*pin, sys.executable, "-u", "-c", code],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL, text=True,
            env={**os.environ, "TZ": "UTC"},
        )
        self.meta = None
        self.samples: list[float] = []

    def _read_tagged(self, tag: str, timeout_s: float):
        deadline = time.monotonic() + timeout_s
        while time.monotonic() < deadline:
            r, _, _ = select.select([self.proc.stdout], [], [], 1.0)
            if not r:
                if self.proc.poll() is not None:
                    raise RuntimeError(
                        f"leg[{self.cpus}] died rc={self.proc.returncode}")
                continue
            line = self.proc.stdout.readline()
            if not line:
                raise RuntimeError(f"leg[{self.cpus}] closed stdout")
            line = line.strip()
            if line.startswith(tag + " "):
                return json.loads(line[len(tag) + 1:])
        raise RuntimeError(f"leg[{self.cpus}] timed out waiting for {tag}")

    def _cmd(self, cmd: str, tag: str, timeout_s: float = 600):
        self.proc.stdin.write(cmd + "\n")
        self.proc.stdin.flush()
        return self._read_tagged(tag, timeout_s)

    def wait_ready(self, timeout_s: float = 600):
        self.meta = self._read_tagged("META", timeout_s)
        return self.meta

    def run_pass(self) -> float:
        wall = self._cmd("GO", "PASS")
        self.samples.append(wall)
        return wall

    def stop(self):
        try:
            self.proc.stdin.close()
            self.proc.wait(timeout=30)
        except Exception:
            self.proc.kill()


def _headline_basis(rounds_detail: list) -> tuple[float, str, list]:
    """Pick the headline efficiency from labeled rounds — pure
    function so the selection policy is unit-testable against real
    run data (tests/test_pipeline.py).

    Policy: fairshare-suspect rounds (eff > 1.05 — unphysical for
    real 1->4-core scaling, the drained-regime CFS ceiling) are
    EXCLUDED from every median; the artifact flags them per round, so
    letting them into the headline would contradict the flag (the
    round-5 degraded-host run medianed 1.03 off two suspect rounds).
    Among non-suspect rounds, prefer the burst-only median when >= 2
    burst rounds exist (those measure dedicated cores); otherwise
    fall back to the non-suspect median, labeled; if EVERY round is
    suspect, report the all-rounds median labeled as such — never
    silently."""
    import statistics as _st

    clean = [r for r in rounds_detail if not r["fairshare_suspect"]]
    burst_clean = [r["eff"] for r in clean if r["regime"] == "burst"]
    clean_effs = [r["eff"] for r in clean]
    all_effs = [r["eff"] for r in rounds_detail]
    if len(burst_clean) >= 2:
        return (_st.median(burst_clean), "burst_only_median",
                burst_clean)
    if clean_effs:
        return (
            _st.median(clean_effs),
            f"nonsuspect_rounds_median ({len(burst_clean)} burst "
            f"round{'' if len(burst_clean) == 1 else 's'}, "
            f"{len(rounds_detail) - len(clean)} suspect excluded)",
            clean_effs,
        )
    return (_st.median(all_effs),
            "all_rounds_median (ALL rounds fairshare-suspect)",
            all_effs)


def measure_scaling() -> dict:
    import threading

    # start both servers (staggered: JVM startup itself burns CPU);
    # try/finally guarantees neither JVM leaks on an exception
    ratio = int(SCALE_BIG / SCALE_SMALL)
    # weak scaling: the big leg's corpus grows with its core count, so
    # one pass of each leg is the same per-core work and the two walls
    # are directly comparable — one job submission and one task wave
    # each, symmetric fixed overhead
    # pinning requires enough ALLOWED cores for both disjoint sets
    # (workers + one spare each). sched_getaffinity, not cpu_count:
    # in a cgroup/cpuset-restricted container cpu_count reports the
    # host, and pinning to disallowed ids would silently truncate the
    # big leg's set (wrong ratio) or kill the leg outright. Core ids
    # are drawn from the actual allowed mask.
    try:
        _allowed = sorted(os.sched_getaffinity(0))
    except AttributeError:  # non-Linux
        _allowed = list(range(os.cpu_count() or 0))
    _need = SCALE_SMALL + 1 + SCALE_BIG + 1
    can_pin = len(_allowed) >= _need
    # Disjoint core pinning (see Leg docstring), with ONE EXTRA core
    # per leg for JVM/driver overhead: in local mode the driver loop,
    # GC and Arrow-shuttle threads are part of the leg process, and
    # without the spare core that fixed thread-load D rides on the
    # small leg's only worker core while amortizing over the big
    # leg's four — measured eff = (4-D)/(4-4D) > 1 (validated: pinned
    # 1-vs-4 cores printed 1.04-1.23). A real cluster runs the driver
    # on its own node and reserves a core per executor node for
    # daemons; the spare core emulates exactly that, so the ratio
    # measures WORKER scaling. The big leg's overhead shares the same
    # single spare core — if it outgrows it the big leg slows and the
    # estimate is biased conservative, never flattering.
    _small_ids = _allowed[: SCALE_SMALL + 1]
    _big_ids = _allowed[SCALE_SMALL + 1 : _need]
    big = Leg(
        SCALE_BIG, ratio * SCALE_CORPUS,
        cpu_list=",".join(map(str, _big_ids)) if can_pin else None,
    )
    small = None
    try:
        big.wait_ready()
        small = Leg(
            SCALE_SMALL, SCALE_CORPUS,
            cpu_list=",".join(map(str, _small_ids)) if can_pin else None,
        )
        small.wait_ready()
        time.sleep(COOLDOWN_START)  # settle before sampling

        def one_round() -> tuple[float, float, float]:
            # fully-overlapped round: one concurrent pass of each leg
            big_walls: list[float] = []
            big_err: list[BaseException] = []

            def big_run():
                try:
                    big_walls.append(big.run_pass())
                except BaseException as e:  # propagate to main thread
                    big_err.append(e)
            t = threading.Thread(target=big_run)
            t.start()
            w_small = small.run_pass()
            t.join()
            if big_err:
                raise big_err[0]
            return w_small / big_walls[0], w_small, big_walls[0]

        # one DISCARDED warm-in round (value-agnostic: always dropped,
        # regardless of its value): the first overlapped round after
        # JVM start + cooldown reliably straddles the burst->throttle
        # regime edge (observed eff 0.16 with the very first small-leg
        # pass catching the full burst window while the big leg ran
        # into the clock cut). It counts against the budget: in a
        # deep-throttle regime a single round can take minutes and the
        # phase must stay inside SCALING_BUDGET_S + one round.
        t_loop = time.monotonic()
        one_round()
        time.sleep(COOLDOWN_ROUND)

        round_stats: list[tuple[float, float, float]] = []
        rounds = 0
        for rounds in range(1, MAX_ROUNDS + 1):
            round_stats.append(one_round())
            if rounds >= MIN_ROUNDS:
                window = [e for e, _, _ in round_stats[-STABLE_WINDOW:]]
                m = statistics.median(window)
                if m > 0 and all(
                    abs(e - m) / m <= STABLE_TOL for e in window
                ):
                    break
            if time.monotonic() - t_loop > SCALING_BUDGET_S:
                break
            time.sleep(COOLDOWN_ROUND)

        round_effs = [e for e, _, _ in round_stats]
        w_small, w_big = min(small.samples), min(big.samples)
        # regime witness: the fastest small-leg wall of the run is the
        # burst-regime reference (min over ALL samples incl. the
        # discarded warm-in round). A round whose small wall is within
        # 1.5x of it ran on a refilled burst budget; slower rounds ran
        # against a drained budget, where CFS fair-sharing pins the
        # overlapped ratio near 1.0 regardless of code — those rounds
        # measure the HOST. eff > 1.05 is unphysical for real 1->4-core
        # scaling and is flagged per round.
        burst_ref = min(small.samples)
        rounds_detail = [
            {
                "eff": round(e, 3),
                "wall_small": ws,
                "wall_big": wb,
                "regime": "burst" if ws <= 1.5 * burst_ref else "drained",
                "fairshare_suspect": e > 1.05,
            }
            for e, ws, wb in round_stats
        ]
        burst_effs = [r["eff"] for r in rounds_detail
                      if r["regime"] == "burst"]
        med_all = statistics.median(round_effs)
        med_burst = statistics.median(burst_effs) if burst_effs else None
        med, basis, basis_pool = _headline_basis(rounds_detail)
        # the headline itself is flagged when most of the rounds that
        # produced it are in fair-share territory (eff > 1.05) — a
        # median of unphysical values is not a code property either
        headline_suspect = (
            2 * sum(1 for e in basis_pool if e > 1.05) >= len(basis_pool)
        )
        return {
            "cpus_small": SCALE_SMALL,
            "cpus_big": SCALE_BIG,
            "docs_small": small.meta["docs"],
            "docs_big": big.meta["docs"],
            "wall_small_sec": w_small,
            "wall_big_sec": w_big,
            # throughput at BOTH parallelism levels (best pass; the
            # per-round medians are recoverable from the samples)
            "docs_per_sec_small": round(small.meta["docs"] / w_small, 1),
            "docs_per_sec_big": round(big.meta["docs"] / w_big, 1),
            "samples_small": small.samples,
            "samples_big": big.samples,
            "round_efficiencies": [round(e, 3) for e in round_effs],
            "rounds_detail": rounds_detail,
            "burst_ref_wall_sec": burst_ref,
            "rounds": rounds,
            "efficiency_all_rounds": round(med_all, 3),
            "efficiency_burst_only": (
                round(med_burst, 3) if med_burst is not None else None
            ),
            "efficiency_basis": basis,
            "headline_fairshare_suspect": headline_suspect,
            "speedup": round(med * ratio, 3),
            "efficiency": round(med, 3),
            "docs": big.meta["docs"],
            "triples": big.meta["triples"],
        }
    finally:
        big.stop()
        if small is not None:
            small.stop()


def run_headline_queries() -> tuple[dict, dict]:
    """Timed headline queries at full parallelism. Runs FIRST (before
    the scaling phase) so these land on a fresh burst budget — round 2
    measured them after ~5 minutes of scaling legs and the drained
    budget inflated kg_connected_components 14.9 -> 20.7 s with zero
    code change. The session is fully stopped before the scaling legs
    spawn (a concurrent JVM poisons the overlapped measurement)."""
    from tortank_spark.session import get_spark

    spark = get_spark("bench-queries", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    headline = [
        "kg_extract_turtle",
        "kg_connected_components",
        "kg_entity_link",
        "r1_pattern_filter",
        "r5_union_dedup",
        "q1_pricing_summary",
        "q3_top_revenue",
        "dedup_exact",
        "dedup_minhash_lsh",
        "text_token_count",
        "sim_topk_cosine",
        "text_winnow",
        "dedup_winnow",
        "mm_features",
        "kg_extract_embedded",
    ]
    qs = entrymod.queries()
    queries = {}
    # untimed warmup: the fresh 32-core session pays python-worker
    # forks + Arrow init once; charging that to the first headline
    # query would misattribute ~5-8 s of session setup to it
    try:
        qs["kg_extract_turtle"](spark, SF_DIR).count()
    except Exception:
        pass
    witness, witness_samples = run_witness(spark)
    # min-of-2 passes per query: the throttled host injects multi-x
    # noise into small absolutes (round 3 saw sim_topk_cosine 1.28 ->
    # 2.71 s with unchanged code/plans); the min of two back-to-back
    # passes is the regression-comparable number, both passes ship in
    # headline_samples
    samples: dict[str, list[float]] = {}
    for name in headline:
        walls = []
        for _ in range(2):
            t0 = time.monotonic()
            try:
                qs[name](spark, SF_DIR).count()
                walls.append(round(time.monotonic() - t0, 3))
            except Exception as e:  # a failing query must not kill the bench
                print(f"bench query {name} failed: {e}", file=sys.stderr)
                break
        samples[name] = walls
        queries[name] = min(walls) if walls else -1.0
    spark.stop()
    queries["extract_witness"] = witness
    samples["extract_witness"] = witness_samples
    return queries, samples


# ---- frozen extraction witness -------------------------------------
# The witness separates CORPUS changes from HOST-regime changes in
# round-over-round comparisons: round 4 saw kg_extract_turtle go
# 0.82 -> 3.22 s with attribution split between a legitimately larger
# corpus (+9% triples, new heavy pages) and a drained host budget, and
# the artifact could not tell the two apart. The witness runs the SAME
# extraction job over a corpus whose parameters are FROZEN — they must
# NEVER change across rounds, independent of SF_DIR, sf-scaled corpus
# growth, or fixture additions. Only code changes and the host regime
# can move this number, and the min-of-2 + headline_samples layout
# lets a reader separate those two the same way the other headline
# rows do.
WITNESS_PAGES = 2000        # FROZEN — do not change across rounds
WITNESS_PARTITIONS = 256    # FROZEN — fixed, NOT derived from CPUS


def run_witness(spark) -> tuple[float, list[float]]:
    """Min-of-2 wall for full extraction through the noop sink over
    the frozen witness corpus. Runs right after the untimed warmup so
    it samples the freshest burst budget of the run."""
    from tortank_spark import fixtures
    from tortank_spark.extract import extract_triples, triples_only

    pages = fixtures.make_pages(
        spark, n_pages=WITNESS_PAGES, n_partitions=WITNESS_PARTITIONS,
        include_broken=False, include_heavy=False,
    ).select("url", "text").persist()
    pages.count()  # materialize the cache outside the timed passes
    walls = []
    for _ in range(2):
        t0 = time.monotonic()
        triples_only(extract_triples(pages)).write.format("noop").mode(
            "overwrite").save()
        walls.append(round(time.monotonic() - t0, 3))
    pages.unpersist()
    return min(walls), walls


# Full artifact sidecar: the grading driver keeps only the tail of
# stdout, and round 4's 2.4 KB final line was truncated from the FRONT
# of that window (BENCH_r04.json: "parsed": null). The printed line is
# therefore a COMPACT summary sized well under the window, and the
# complete artifact (per-pass sample arrays, per-round detail) goes to
# a sidecar file next to bench.py that the harness or a reader can
# open directly.
SIDECAR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "BENCH_SIDECAR.json")


def compact_summary(out: dict) -> dict:
    """Tail-window-safe view of the full artifact: drops the per-pass
    sample arrays and per-round dicts but keeps everything the north
    rule grades — walls, throughput, efficiency + basis, per-round
    efficiencies, regime labels, and the suspect count — plus a
    pointer to the sidecar holding the rest. Pure function, size-
    pinned by tests/test_pipeline.py."""
    slim = {k: v for k, v in out.items() if k != "headline_samples"}
    sc = {k: v for k, v in out["scaling"].items()
          if k not in ("samples_small", "samples_big", "rounds_detail")}
    detail = out["scaling"].get("rounds_detail", [])
    sc["regimes"] = [r["regime"] for r in detail]
    sc["n_fairshare_suspect"] = sum(
        1 for r in detail if r["fairshare_suspect"])
    slim["scaling"] = sc
    slim["sidecar"] = os.path.basename(SIDECAR)
    return slim


def main():
    t_all = time.monotonic()
    queries, headline_samples = run_headline_queries()
    scaling = measure_scaling()
    w_big = scaling["wall_big_sec"]
    queries["extract_local_small"] = scaling["wall_small_sec"]
    queries["extract_local_big"] = w_big

    total = round(time.monotonic() - t_all, 3)
    out = {
        "metric": "e2e_bench_sec",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "headline_samples": headline_samples,
        "sf": SF,
        "extract_docs": scaling["docs"],
        "extract_triples": scaling["triples"],
        "triples_per_sec": round(scaling["triples"] / w_big, 1) if w_big else None,
        "docs_per_sec": round(scaling["docs"] / w_big, 1) if w_big else None,
        "scaling": scaling,
    }
    with open(SIDECAR, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps(compact_summary(out)))


if __name__ == "__main__":
    main()
