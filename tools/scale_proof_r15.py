"""Core-scaling proof for the r14/r15 parallelism claims (VERDICT r14
item 3): the sf0.1 bench is overhead-bound (8-core ≈ 32-core), so the
claims that the spread()/flat-layout/pivot paths fan out rest on these
10-40x-size runs at two core counts.

Usage::

    SPARK_GRAFT_CPUS=8  python tools/scale_proof_r15.py [mrows]
    SPARK_GRAFT_CPUS=32 python tools/scale_proof_r15.py [mrows]

Prints one JSON line {op: wall_sec}.  Ops cover the five families the
verdict named: media decode (pdf extract), split_leakage, the langid
marker scan, the neardup index write, repeated_spans — plus
dedup_documents end-to-end and the corpus quality scan.
Synthesis/checkpoint cost is excluded (frames are localCheckpointed
before timing).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pypond_spark.session import get_spark  # noqa: E402
from tools.stress import documents, documents_dups  # noqa: E402


def sink(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    mrows = float(sys.argv[1]) if len(sys.argv) > 1 else 20.0
    n = int(mrows * 1_000_000)
    n_docs = max(n // 700, 1)       # ~28.5k docs/20 mrows, ~700 chars each
    spark = get_spark("pypond_scale_proof")
    spark.sparkContext.setLogLevel("ERROR")
    # Python-boundary warmup so the session constant doesn't land on
    # the first Arrow op (same rationale as bench.py)
    spark.range(0, 64, 1, 64).mapInPandas(lambda it: it, "id long") \
        .write.format("noop").mode("overwrite").save()

    docs = documents(spark, n_docs).localCheckpoint()
    docs.count()
    out: dict[str, float] = {}

    def t(name, fn, reps=2):
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        out[name] = round(best, 2)
        print(f"{name:20s} {out[name]:8.2f}", file=sys.stderr)

    from pypond_spark.datapipe import decontam as dc
    from pypond_spark.datapipe import dedup as dd
    from pypond_spark.datapipe import textstats as tx

    # 1. langid marker scan (r15 compiled-regex form) + gopher staging
    t("language_id", lambda: sink(tx.language_id(docs)))
    t("gopher_quality", lambda: sink(tx.gopher_quality(docs)))

    # 2. split_leakage (the r14 one-pass decontam window form)
    t("split_leakage", lambda: sink(
        dc.split_leakage(docs, {"train": 0.8, "test": 0.2})))

    # 3. repeated_spans (k=50 gram explode over corpus chars)
    t("repeated_spans", lambda: sink(dd.repeated_spans(docs, k=50)))

    # 4. neardup index write (flat/partitioned auto layout)
    import shutil
    import tempfile

    def write_index():
        path = tempfile.mkdtemp(prefix="pypond_scale_ndidx_")
        try:
            dd.write_neardup_index(docs, path, layout="auto")
        finally:
            shutil.rmtree(path, ignore_errors=True)

    t("neardup_index", write_index)

    # 5. dedup_documents end-to-end (LSH + verify + components)
    dups = documents_dups(spark, n_docs).localCheckpoint()
    dups.count()
    t("dedup_documents", lambda: sink(
        dd.dedup_documents(dups).select("doc_id", "is_keeper")))

    # 6. media decode: real PDF parse at this corpus size (spread path)
    from tools.stress import _pdf_extract_stress
    out["pdf_extract"] = round(_pdf_extract_stress(spark, n), 2)
    print(f"{'pdf_extract':20s} {out['pdf_extract']:8.2f}", file=sys.stderr)

    print(json.dumps({"cpus": os.environ.get("SPARK_GRAFT_CPUS", "*"),
                      "mrows": mrows, "ops": out}))


if __name__ == "__main__":
    main()
