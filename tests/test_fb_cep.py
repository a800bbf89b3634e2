"""foreachBatch streaming CEP tier route (round 15).

The route's plumbing (runner hook, watermark replay, drain) is pinned
end-to-end by the st14/st23 parity gates; these tests pin the two
pieces with their own math:

- shape classification — which specs take the route at all;
- the emission-frontier SPLIT — a randomized resume differential:
  feeding a stream through repeated (split → match decided → carry
  tail) cycles must emit exactly the batch matcher's result on the
  full frame, for ANY cut of the stream into release chunks.
"""

from __future__ import annotations

import random

import pytest

from flink_streaming_platform_web_spark.operators import cep


ST14_CLAUSE = """
  PARTITION BY user_id
  ORDER BY ts, event_id
  MEASURES
    FIRST(STRT.event_id) AS start_id,
    LAST(UP.event_id) AS end_id,
    COUNT(UP.*) AS n_up,
    LAST(UP.value) AS peak
  ONE ROW PER MATCH
  AFTER MATCH SKIP PAST LAST ROW
  PATTERN (STRT UP+)
  DEFINE UP AS UP.value > PREV(UP.value)
"""

ST23_CLAUSE = """
  PARTITION BY user_id
  ORDER BY ts, event_id
  MEASURES
    FIRST(LO.event_id) AS lo_id,
    FIRST(HI.event_id) AS hi_id,
    FIRST(HI.value) AS hi_val
  ONE ROW PER MATCH
  AFTER MATCH SKIP TO NEXT ROW
  PATTERN (LO HI)
  DEFINE LO AS LO.value < 20.0,
         HI AS HI.value >= 80.0
"""

# consuming fixed-length — must NOT take the route (frontier math
# would need the scan's consumption chain)
ST19_CLAUSE = """
  PARTITION BY user_id
  ORDER BY ts, event_id
  MEASURES FIRST(HI.event_id) AS hi_id, FIRST(LO.event_id) AS lo_id
  ONE ROW PER MATCH
  AFTER MATCH SKIP PAST LAST ROW
  PATTERN (PERMUTE(HI, LO))
  DEFINE HI AS HI.value >= 55.0, LO AS LO.value < 20.0
"""

SCHEMA = "user_id BIGINT, event_id BIGINT, ts TIMESTAMP, value DOUBLE"


def _probe(spark):
    return spark.createDataFrame([], SCHEMA)


def test_shape_classification(spark):
    p = _probe(spark)
    spec14 = cep.parse_match_recognize(ST14_CLAUSE)
    s14 = cep.fb_stream_shape(
        p, spec14, cep.infer_output_schema(spec14, p)
    )
    assert s14 == ("trailing_plus", None)
    spec23 = cep.parse_match_recognize(ST23_CLAUSE)
    s23 = cep.fb_stream_shape(
        p, spec23, cep.infer_output_schema(spec23, p)
    )
    assert s23 == ("fixed_next", 2)
    spec19 = cep.parse_match_recognize(ST19_CLAUSE)
    assert (
        cep.fb_stream_shape(
            p, spec19, cep.infer_output_schema(spec19, p)
        )
        is None
    )


def test_trailing_split_partitions_frame(spark):
    """decided + tail == frame, and tail is each key's LAST island
    (always contains the key's last row in ORDER BY order)."""
    import datetime

    rows = []
    rng = random.Random(7)
    t0 = datetime.datetime(2030, 1, 1)
    eid = 0
    for uid in range(4):
        for i in range(40):
            rows.append(
                (
                    uid,
                    eid,
                    t0 + datetime.timedelta(minutes=eid),
                    float(rng.randrange(100)),
                )
            )
            eid += 1
    df = spark.createDataFrame(rows, SCHEMA)
    spec = cep.parse_match_recognize(ST14_CLAUSE)
    decided, tail = cep.fb_trailing_plus_split(df, spec)
    d = decided.collect()
    t = tail.collect()
    assert len(d) + len(t) == len(rows)
    # every key's max-event row is in the tail
    last_by_key = {}
    for r in rows:
        if r[0] not in last_by_key or r[1] > last_by_key[r[0]]:
            last_by_key[r[0]] = r[1]
    tail_ids = {(r.user_id, r.event_id) for r in t}
    for uid, last_eid in last_by_key.items():
        assert (uid, last_eid) in tail_ids
    # tail rows of one key are a contiguous suffix in event order
    for uid in last_by_key:
        k_tail = sorted(r.event_id for r in t if r.user_id == uid)
        assert k_tail == list(
            range(k_tail[0], k_tail[0] + len(k_tail))
        )


@pytest.mark.parametrize("clause,shape", [
    (ST14_CLAUSE, "trailing_plus"),
    (ST23_CLAUSE, "fixed_next"),
])
def test_randomized_resume_differential(spark, clause, shape):
    """The frontier soundness argument, executed: cut a random stream
    into arbitrary release chunks, run the fb cycle (frame = carried
    tail + chunk → split → batch-match the decided part → carry the
    tail), drain the final tail, and compare the union of emissions
    against the batch matcher over the full stream. Any frontier
    off-by-one (emitting a still-extensible island, dropping a
    boundary window) shows up as a row diff."""
    import datetime

    spec = cep.parse_match_recognize(clause)
    p = _probe(spark)
    schema = cep.infer_output_schema(spec, p)
    k = len(spec.pattern) if shape == "fixed_next" else None
    for seed in range(4):
        rng = random.Random(seed)
        rows = []
        t0 = datetime.datetime(2030, 1, 1)
        eid = 0
        for uid in range(3):
            for _ in range(rng.randrange(20, 45)):
                rows.append(
                    (
                        uid,
                        eid,
                        t0 + datetime.timedelta(minutes=eid),
                        float(rng.randrange(100)),
                    )
                )
                eid += 1
        # release chunks cut on GLOBAL event order (the watermark is
        # a global event-time cut — every key releases up to it)
        rows.sort(key=lambda r: (r[2], r[1]))
        cuts = sorted(
            rng.sample(range(1, len(rows)), rng.randrange(2, 6))
        )
        chunks = [
            rows[a:b]
            for a, b in zip([0] + cuts, cuts + [len(rows)])
        ]
        tail_rows: list = []
        emitted: list = []

        def run_frame(frame_rows, final):
            frame = spark.createDataFrame(frame_rows, SCHEMA)
            if final:
                decided, tail = frame, None
            elif shape == "trailing_plus":
                decided, tail = cep.fb_trailing_plus_split(
                    frame, spec
                )
            else:
                # fixed_next: all matches are final; carry the last
                # k-1 rows per key
                decided = frame
                by_key: dict = {}
                for r in frame_rows:
                    by_key.setdefault(r[0], []).append(r)
                tail = [
                    r
                    for grp in by_key.values()
                    for r in sorted(grp, key=lambda x: (x[2], x[1]))[
                        -(k - 1):
                    ]
                ]
            out = cep.match_recognize(decided, spec, schema).collect()
            if tail is None:
                new_tail = []
            elif isinstance(tail, list):
                new_tail = tail
            else:
                new_tail = [
                    (r.user_id, r.event_id, r.ts, r.value)
                    for r in tail.collect()
                ]
            return out, new_tail

        for chunk in chunks:
            frame_rows = tail_rows + chunk
            out, tail_rows = run_frame(frame_rows, final=False)
            emitted.extend(out)
        if tail_rows:
            out, _ = run_frame(tail_rows, final=True)
            emitted.extend(out)
        batch = cep.match_recognize(
            spark.createDataFrame(rows, SCHEMA), spec, schema
        ).collect()
        assert sorted(map(tuple, emitted)) == sorted(
            map(tuple, batch)
        ), f"seed {seed}: resume emissions != batch matches"
