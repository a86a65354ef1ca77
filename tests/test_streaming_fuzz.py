"""Micro-batch protocol fuzz for the stateful streaming twins.

The stream==batch e2e tests pin a handful of arrival orders; this
harness drives the module-level state-transition functions directly
(no Spark runtime — pure Python, so hypothesis can afford hundreds of
scenarios) through a simulator of the measured Spark 4 micro-batch
protocol, and checks every emission against an independently-coded
reference over the ADMITTED rows:

  * watermark for batch N = max(event time through batch N-1) - delay
    (monotone; "unset" before any data);
  * the LATE FILTER lags the processor-visible watermark by one batch
    (drops a row iff ts <= filter_wm) — the semantics measured and
    pinned by test_scd2_stream_watermark_boundary_semantics;
  * a key with data is invoked with hasTimedOut=False; a silent key
    whose timeout timestamp is <= the current watermark is invoked
    with an empty batch and hasTimedOut=True (EventTimeTimeout);
  * availableNow's final empty commit batch runs one last
    timeout-only pass under the final watermark.

Properties per twin: (1) every emitted unit equals the reference on
admitted rows; (2) exactly the watermark-closed units are emitted —
no unit twice, none missing, none early."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lab04_spark_streaming_spark.streaming.state import (
    _kmv_estimate,
    _kmv_state_fn,
    _twap_state_fn,
    _volume_anomaly_state_fn,
)

HOUR_US = 3_600_000_000
DAY_US = 86_400_000_000
BASE_US = 1_700_000_000_000_000 - (1_700_000_000_000_000 % DAY_US)


class StubState:
    def __init__(self) -> None:
        self._v = None
        self.wm_ms = 0
        self.hasTimedOut = False
        self.timeout_ms = None
        self.removed = False

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v
        self.removed = False

    def remove(self):
        self._v = None
        self.removed = True

    def getCurrentWatermarkMs(self):
        return self.wm_ms


def run_protocol(fn, arrivals, n_batches, delay_us, columns):
    """Drive ``fn`` through the micro-batch protocol.

    arrivals: list of (key, ts_us, row_dict) in ARRIVAL order.
    Returns (emitted_rows, admitted) where emitted_rows is the concat
    of every yielded DataFrame (plus the key) and admitted is the
    arrival subset that survived the late filter."""
    n = len(arrivals)
    cuts = [round(i * n / n_batches) for i in range(n_batches + 1)]
    batches = [arrivals[cuts[i]:cuts[i + 1]] for i in range(n_batches)]

    states: dict = {}
    emitted: list[dict] = []
    admitted: list = []
    max_ts_seen = None  # through the END of the previous batch
    filter_wm_us = None  # lags the processor wm by one batch

    def invoke(key, rows, wm_us, timed_out):
        stt = states.setdefault(key, StubState())
        stt.wm_ms = 0 if wm_us is None else wm_us // 1000
        stt.hasTimedOut = timed_out
        if timed_out:
            stt.timeout_ms = None
        pdfs = (
            iter([pd.DataFrame(rows, columns=columns)]) if rows else iter([])
        )
        stt.setTimeoutTimestamp = lambda ms: setattr(stt, "timeout_ms", ms)
        for pdf in fn((key,), pdfs, stt):
            for rec in pdf.to_dict("records"):
                emitted.append({"_key": key, **rec})

    wm_us = None
    for batch in batches + [[]]:  # final empty commit batch
        # protocol: processor wm from data through the previous batch;
        # the late filter lags it by one more batch.
        prev_wm_us = wm_us
        wm_us = None if max_ts_seen is None else max_ts_seen - delay_us
        filter_wm_us = prev_wm_us

        ok = [
            a
            for a in batch
            if filter_wm_us is None or a[1] > filter_wm_us
        ]
        admitted.extend(ok)
        by_key: dict = {}
        for key, _ts, row in ok:
            by_key.setdefault(key, []).append(row)
        for key, rows in by_key.items():
            invoke(key, rows, wm_us, timed_out=False)
        # EventTimeTimeout pass for silent keys
        if wm_us is not None:
            for key, stt in states.items():
                if (
                    key not in by_key
                    and stt.exists
                    and stt.timeout_ms is not None
                    and stt.timeout_ms <= wm_us // 1000
                ):
                    invoke(key, [], wm_us, timed_out=True)
        if batch:
            mx = max(ts for _, ts, _ in batch)
            max_ts_seen = mx if max_ts_seen is None else max(max_ts_seen, mx)

    final_wm_us = None if max_ts_seen is None else max_ts_seen - delay_us
    return emitted, admitted, final_wm_us


# ---------------------------------------------------------------------------
# strategies


def scenario(n_keys=2, n_events=(1, 36), span_hours=3):
    events = st.lists(
        st.tuples(
            st.integers(0, n_keys - 1),
            st.integers(0, span_hours * 3600 - 1),  # second offset
            st.integers(1, 9999),  # cents / hash material
        ),
        min_size=n_events[0],
        max_size=n_events[1],
    )
    return st.tuples(
        events.flatmap(
            lambda ev: st.permutations(ev) if ev else st.just([])
        ),
        st.integers(1, 6),  # micro-batch count
        st.sampled_from([10_000_000, 300_000_000, HOUR_US]),  # delay
    )


# ---------------------------------------------------------------------------
# TWAP


@settings(
    max_examples=300,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(scenario())
def test_twap_fuzz(sc):
    events, n_batches, delay_us = sc
    # distinct ts per key (duplicate-ts contract is out of scope)
    seen = set()
    arrivals = []
    for key, off_s, cents in events:
        ts = BASE_US + off_s * 1_000_000
        if (key, ts) in seen:
            continue
        seen.add((key, ts))
        arrivals.append(
            (key, ts, {"_ts_us": ts, "_value": cents / 100.0})
        )

    emitted, admitted, final_wm = run_protocol(
        _twap_state_fn(), arrivals, n_batches, delay_us,
        columns=["_ts_us", "_value"],
    )

    # reference: hold-until-next weights per (key, hour), over admitted
    by_key: dict = {}
    for key, ts, row in admitted:
        by_key.setdefault(key, []).append((ts, row["_value"]))
    expect = {}
    for key, rows in by_key.items():
        by_hour: dict = {}
        for t, v in sorted(rows):
            by_hour.setdefault(t - t % HOUR_US, []).append((t, v))
        for h0, hrows in by_hour.items():
            if final_wm is None or h0 + HOUR_US > final_wm:
                continue  # not watermark-closed -> must NOT emit
            sum_cents_w = 0
            sum_w = 0
            for i, (t, v) in enumerate(hrows):
                nxt = hrows[i + 1][0] if i + 1 < len(hrows) else h0 + HOUR_US
                w = nxt - t
                sum_cents_w += round(v * 100) * w
                sum_w += w
            expect[(key, h0)] = (
                len(hrows),
                sum_w,
                (float(sum_cents_w) / 100.0) / float(sum_w),
            )

    got = {}
    for rec in emitted:
        k = (rec["_key"], rec["hour_start"].value // 1000)
        assert k not in got, f"hour emitted twice: {k}"
        got[k] = (rec["n_events"], rec["span_us"], rec["twap"])
    assert got == expect


# ---------------------------------------------------------------------------
# KMV (key IS the hour bucket; payload is the item hash)


@settings(
    max_examples=300,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(scenario(n_keys=1), st.integers(2, 8))
def test_kmv_fuzz(sc, k):
    events, n_batches, delay_us = sc
    arrivals = []
    for _key, off_s, hval in events:
        ts = BASE_US + off_s * 1_000_000
        h0 = ts - ts % HOUR_US
        arrivals.append((h0, ts, {"_h": hval % 50}))  # force collisions

    emitted, admitted, final_wm = run_protocol(
        _kmv_state_fn(k), arrivals, n_batches, delay_us, columns=["_h"]
    )

    by_hour: dict = {}
    for h0, _ts, row in admitted:
        by_hour.setdefault(h0, set()).add(row["_h"])
    expect = {}
    for h0, hashes in by_hour.items():
        if final_wm is None or h0 + HOUR_US > final_wm:
            continue
        sk = sorted(hashes)[:k]
        kth = sk[-1] if len(sk) == k else -1
        expect[h0] = (len(sk), kth, _kmv_estimate(len(sk), sk[-1], k))

    got = {}
    for rec in emitted:
        h0 = rec["hour_start"].value // 1000
        assert h0 not in got, f"hour emitted twice: {h0}"
        got[h0] = (rec["n_sketch"], rec["kth_hash"], rec["est"])
    assert got == expect


# ---------------------------------------------------------------------------
# volume anomaly


@settings(
    max_examples=300,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(scenario(n_keys=2, n_events=(1, 40), span_hours=4 * 24))
def test_volume_anomaly_fuzz(sc):
    """Span is capped at trail_days days so the documented
    silent-key trail-expiry deviation (stream restarts the trailing
    window after the cleanup horizon; batch does not) is unreachable
    — the horizon timeout cannot fire inside a 4-day axis.  The
    expiry branches themselves are pinned by
    test_volume_anomaly_state_cleanup_paths."""
    events, n_batches, delay_us = sc
    trail_days, sigma = 4, 3
    arrivals = []
    for key, off_s, _ in events:
        ts = BASE_US + off_s * 1_000_000
        arrivals.append((key, ts, {"_ts_us": ts}))

    emitted, admitted, final_wm = run_protocol(
        _volume_anomaly_state_fn(trail_days, sigma),
        arrivals, n_batches, delay_us, columns=["_ts_us"],
    )

    by_key: dict = {}
    for key, ts, _row in admitted:
        d0 = ts - ts % DAY_US
        by_key.setdefault(key, {}).setdefault(d0, 0)
        by_key[key][d0] += 1
    expect = {}
    for key, days in by_key.items():
        counts = [days[d0] for d0 in sorted(days)]
        for i, d0 in enumerate(sorted(days)):
            if final_wm is None or d0 + DAY_US > final_wm:
                continue
            window = counts[max(0, i - trail_days):i]
            n, x = len(window), counts[i]
            flag = False
            if n >= 3:
                s, sq = sum(window), sum(c * c for c in window)
                flag = (n * x - s) ** 2 > sigma * sigma * (n * sq - s * s)
            expect[(key, d0)] = (x, n, flag)

    got = {}
    for rec in emitted:
        k = (rec["_key"], rec["day"].value // 1000)
        assert k not in got, f"day emitted twice: {k}"
        got[k] = (rec["cnt"], rec["trailing_days"], rec["is_anomaly"])
    assert got == expect


# ---------------------------------------------------------------------------
# first crossing


@settings(
    max_examples=300,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(scenario(n_keys=2, n_events=(1, 30), span_hours=1), st.sampled_from([30, 120, 900]))
def test_first_crossing_fuzz(sc, horizon_s):
    """Random arrival orders through the protocol must emit exactly
    the final ticks, each with the first strictly-higher crossing
    within the horizon over the ADMITTED rows (or null once the whole
    horizon is final).  Distinct ts per key — the duplicate-tick
    MAX-collapse contract is pinned by the e2e tests."""
    from lab04_spark_streaming_spark.streaming.state import (
        _first_crossing_state_fn,
    )

    events, n_batches, delay_us = sc
    seen = set()
    arrivals = []
    for key, off_s, cents in events:
        ts = BASE_US + off_s * 1_000_000
        if (key, ts) in seen:
            continue
        seen.add((key, ts))
        arrivals.append(
            (key, ts, {"_ts_us": ts, "_value": float(cents % 7)})
        )

    emitted, admitted, final_wm = run_protocol(
        _first_crossing_state_fn(horizon_s, "higher"),
        arrivals, n_batches, delay_us, columns=["_ts_us", "_value"],
    )

    hor_us = horizon_s * 1_000_000
    by_key: dict = {}
    for key, ts, row in admitted:
        by_key.setdefault(key, []).append((ts, row["_value"]))
    expect = {}
    for key, rows in by_key.items():
        rows.sort()
        for i, (t, v) in enumerate(rows):
            hit = None
            for t2, v2 in rows[i + 1:]:
                if t2 - t > hor_us:
                    break
                if v2 > v:
                    hit = t2
                    break
            if final_wm is None:
                continue
            if hit is not None and hit <= final_wm:
                expect[(key, t)] = (v, (hit - t) / 1e6)
            elif hit is None and t + hor_us < final_wm:
                expect[(key, t)] = (v, None)

    got = {}
    for rec in emitted:
        k = (rec["_key"], rec["ts"].value // 1000)
        assert k not in got, f"tick emitted twice: {k}"
        s = rec["seconds_until"]
        got[k] = (rec["value"], None if s != s else s)  # NaN -> None
    assert got == expect


# ---------------------------------------------------------------------------
# SCD-2 closed intervals


@settings(
    max_examples=300,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(scenario(n_keys=2, n_events=(1, 30), span_hours=2))
def test_scd2_fuzz(sc):
    """Random arrival orders must yield exactly the closed runs with
    valid_to strictly below the final watermark, each with the batch
    gaps-and-islands attribute/bounds/count over the ADMITTED rows —
    an admissible row interleaving BETWEEN pending events must
    rewrite the run structure before anything emits.  Distinct ts per
    key (the duplicate-ts tie-break is pinned by the e2e tests)."""
    from lab04_spark_streaming_spark.streaming.state import _scd2_state_fn

    events, n_batches, delay_us = sc
    seen = set()
    arrivals = []
    for key, off_s, x in events:
        ts = BASE_US + off_s * 1_000_000
        if (key, ts) in seen:
            continue
        seen.add((key, ts))
        arrivals.append(
            (key, ts,
             {"_ts_us": ts, "_eid": len(seen), "_attr": f"a{x % 2}"})
        )

    emitted, admitted, final_wm = run_protocol(
        _scd2_state_fn(), arrivals, n_batches, delay_us,
        columns=["_ts_us", "_eid", "_attr"],
    )

    by_key: dict = {}
    for key, ts, row in admitted:
        by_key.setdefault(key, []).append((ts, row["_attr"]))
    expect = {}
    for key, rows in by_key.items():
        rows.sort()
        runs: list = []  # (attr, first_ts, n)
        for t, a in rows:
            if runs and runs[-1][0] == a:
                runs[-1][2] += 1
            else:
                runs.append([a, t, 1])
        for i in range(len(runs) - 1):  # the open last run never emits
            attr, vfrom, n = runs[i]
            vto = runs[i + 1][1]
            if final_wm is not None and vto < final_wm:
                expect[(key, vfrom)] = (attr, vto, n)

    got = {}
    for rec in emitted:
        k = (rec["_key"], rec["valid_from"].value // 1000)
        assert k not in got, f"interval emitted twice: {k}"
        got[k] = (
            rec["event_type"],
            rec["valid_to"].value // 1000,
            rec["n_events"],
        )
    assert got == expect


# ---------------------------------------------------------------------------
# gap sessionization (ordinal ids)


@settings(
    max_examples=300,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(scenario(n_keys=2, n_events=(1, 30), span_hours=2), st.sampled_from([60, 600, 1800]))
def test_sessionize_fuzz(sc, gap_s):
    """Random arrival orders must emit exactly the finalized sessions
    (watermark past end + gap under the second-truncated rule), with
    the batch gaps-and-islands splits, counts, bounds AND ordinal
    numbering over the ADMITTED rows.  No counter TTL — the TTL
    renumbering deviation is pinned separately by the e2e tests."""
    from lab04_spark_streaming_spark.streaming.state import (
        _sessionize_state_fn,
    )

    events, n_batches, delay_us = sc
    arrivals = []
    for key, off_s, _x in events:
        ts = BASE_US + off_s * 1_000_000
        arrivals.append((key, ts, {"_ts_us": ts}))

    emitted, admitted, final_wm = run_protocol(
        _sessionize_state_fn(gap_s), arrivals, n_batches, delay_us,
        columns=["_ts_us"],
    )

    by_key: dict = {}
    for key, ts, _row in admitted:
        by_key.setdefault(key, []).append(ts)
    expect = {}
    for key, ts_list in by_key.items():
        ts_list.sort()
        sessions: list = []
        for t in ts_list:
            if sessions and (
                t // 1_000_000 - sessions[-1][-1] // 1_000_000 > gap_s
            ):
                sessions.append([t])
            elif sessions:
                sessions[-1].append(t)
            else:
                sessions = [[t]]
        for sid, s in enumerate(sessions):
            bound = (s[-1] // 1_000_000 + gap_s + 1) * 1_000_000
            if final_wm is not None and bound <= final_wm:
                expect[(key, sid)] = (len(s), s[0], s[-1])

    got = {}
    for rec in emitted:
        k = (rec["_key"], rec["session_id"])
        assert k not in got, f"session emitted twice: {k}"
        got[k] = (
            rec["n_events"],
            rec["session_start"].value // 1000,
            rec["session_end"].value // 1000,
        )
    assert got == expect
