#!/usr/bin/env python3
"""Build the PRE-EPOCH timestamp events slice for the floor-vs-truncate audit.

The negative-cents slice (negslice.py) hunts the class on VALUE-derived
integers; this slice hunts it on TIME-derived ones: shift `events.ts` by
a constant so epoch micros span negatives (~half the rows land before
1970), symlink the other tables unchanged, then run the FULL oracle
sweep over the slice — every `ts_us DIV DayUs` / window-bucketing site
whose engine-side rounding convention differs from its oracle's on
negative operands hash-mismatches. Relative computations (gaps, rates,
sessions) are untouched by a constant shift, so divergences isolate the
epoch-absolute bucketing sites exactly.

Usage: python3 tools/negts.py [sfdir] [outdir]
Then:  sbt -batch "runMain graft.Verify <outdir> /tmp/vout_negts"
       python3 tools/check.py <outdir> /tmp/vout_negts --exclude=<WATERMARK_BOUND below>

The round-12 sweep over this slice found and fixed 9 engine/oracle
divergences (holt_winters' %24 seasonal slot, the asof-tolerance and
funnel-stream -1 sentinels colliding with real negative timestamps,
the day-slice fixtures' range-vs-truncated-day mismatch, merge's
absolute epoch constants, ingest_stream's trunc-vs-floor window
start). The remaining set below is NOT fixable in this engine:
Structured Streaming's global watermark initializes at epoch 0 ms and
only ratchets upward (WatermarkTracker), so stateful operators with
watermark-based late-row filtering drop EVERY pre-epoch event as
late — a platform bound, not a query bug. These queries are excluded
from the slice's green gate and documented in SURVEY §3. Since r13 the
bound is FAIL-LOUD in the engine (Tables.requirePostEpochTs raises on
any pre-epoch row in these streams), so running them on this slice
errors by design instead of silently dropping rows.
"""
import os, sys
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

TABLES = "region nation customer supplier part orders lineitem documents embeddings".split()

# stateful streams whose watermark late-filter makes pre-epoch event
# time undeliverable on Spark (watermark floor = epoch 0)
WATERMARK_BOUND = ",".join([
    "ts_sessionize_stream", "ts_topk_stream", "ts_anomaly_stream_ooo",
    "ts_ewma_stream_ooo", "ts_rate_stream_ooo", "ts_stream_join",
    "ts_dedup_stream_events",
])

def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_negts"
    os.makedirs(outdir, exist_ok=True)
    t = pq.read_table(f"{sfdir}/events.parquet")
    ts = t["ts"]
    # shift so the MIDPOINT of the ts range lands at epoch 0: a real mix
    # of negative and positive epoch micros, ordering and gaps untouched
    tmin = pc.min(ts).cast(pa.int64()).as_py()
    tmax = pc.max(ts).cast(pa.int64()).as_py()
    shift_us = (tmin + tmax) // 2
    unit = ts.type.unit if hasattr(ts.type, "unit") else "us"
    shift = shift_us if unit == "us" else shift_us * 1000
    shifted_ts = pc.subtract(ts.cast(pa.int64()), pa.scalar(shift, pa.int64())).cast(ts.type)
    shifted = t.set_column(t.schema.get_field_index("ts"), "ts", shifted_ts)
    pq.write_table(shifted, f"{outdir}/events.parquet")
    neg = pc.sum(pc.cast(pc.less(shifted_ts.cast(pa.int64()), 0), pa.int64())).as_py()
    for name in TABLES:
        dst = f"{outdir}/{name}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{sfdir}/{name}.parquet", dst)
    print(f"wrote {outdir}: {shifted.num_rows} events, {neg} with ts < epoch (unit={unit}, shift={shift})")
    print(f"check with: python3 tools/check.py {outdir} <voutdir> --exclude={WATERMARK_BOUND}")

if __name__ == "__main__":
    main()
