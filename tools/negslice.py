#!/usr/bin/env python3
"""Build the NEGATIVE-VALUE events slice for the floor-vs-truncate audit.

Three divergences of the floor/truncate-on-negative class were found by
inspection across rounds (ts_drift_tv, ts_value_histogram,
ts_histogram_quantile); this slice finds the rest of the class
mechanically: shift `events.value` by a constant so the derived cents
span negatives (~60% of rows go negative at offset 30.0), symlink the
other tables unchanged, then run the FULL oracle sweep over the slice —
any operator whose engine-side rounding convention differs from its
oracle's on negative operands hash-mismatches.

Usage: python3 tools/negslice.py [sfdir] [outdir]
Then:  sbt -batch "runMain graft.Verify <outdir> /tmp/vout_neg"
       python3 tools/check.py <outdir> /tmp/vout_neg
"""
import os, sys
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

TABLES = "region nation customer supplier part orders lineitem documents embeddings".split()
OFFSET = 30.0  # median-ish: a real mix of negative and positive cents

def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_negslice"
    os.makedirs(outdir, exist_ok=True)
    t = pq.read_table(f"{sfdir}/events.parquet")
    shifted = t.set_column(
        t.schema.get_field_index("value"), "value",
        pc.subtract(t["value"], pa.scalar(OFFSET, pa.float64())))
    pq.write_table(shifted, f"{outdir}/events.parquet")
    neg = pc.sum(pc.cast(pc.less(shifted["value"], 0.0), pa.int64())).as_py()
    for name in TABLES:
        dst = f"{outdir}/{name}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{sfdir}/{name}.parquet", dst)
    print(f"wrote {outdir}: {shifted.num_rows} events, {neg} with value < 0")

if __name__ == "__main__":
    main()
