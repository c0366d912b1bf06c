"""Compare LZ4-compressed shuffle bytes for the SAME subject-keyed
shuffle under three term encodings:

- ``raw``    — (s_kind, s) string columns straight from the triple table
- ``hash``   — xxhash64 content-hash ids (operators/dictionary.encode_triples)
- ``dense``  — sorted sequential ids (build_dense_dictionary/encode_triples_dense)

This is the follow-up to the PERF.md `use_ids` finding: content-hash ids
cut RAW shuffle bytes ~5× but are incompressible, so LZ4 breaks even on
this synthetic corpus whose `urn:g:...` strings compress ~14:1.  Dense
ids keep the 8-byte fixed width AND compress (small magnitudes, shared
zero prefixes), so they should win on the wire too.

Usage: python scripts/dense_ids_bytes.py [sf_dir]
Set SHUFFLE_RAW=1 for the uncompressed comparison.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from shuffle_bytes import stage_metrics  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    results = {}
    for mode in ("raw", "hash", "dense"):
        spark = (
            SparkSession.builder.master("local[8]")
            .appName(f"dense-ids-{mode}")
            .config("spark.sql.shuffle.partitions", "8")
            .config("spark.ui.enabled", "true")
            .config("spark.ui.port", "4099")
            .config("spark.sql.adaptive.enabled", "false")
            .config("spark.shuffle.compress",
                    "false" if os.environ.get("SHUFFLE_RAW") else "true")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        from sparkdon.operators.dictionary import (
            build_dense_dictionary, encode_triples, encode_triples_dense,
        )
        from sparkdon.rdfize import rdfize

        triples = rdfize(spark, sf_dir)
        if mode == "raw":
            keyed = triples.select("s_kind", "s")
            key = ["s_kind", "s"]
        elif mode == "hash":
            keyed = encode_triples(triples).select("s_id")
            key = ["s_id"]
        else:
            d = build_dense_dictionary(triples)
            # materialize the encoded table first so the dictionary-build
            # and encode joins don't pollute the measured shuffle
            enc = encode_triples_dense(triples, d).select("s_id")
            enc.write.mode("overwrite").parquet("/tmp/dense_enc.parquet")
            keyed = spark.read.parquet("/tmp/dense_enc.parquet")
            key = ["s_id"]
            # reset stage metrics by measuring deltas instead: record now
            pre_w, _ = stage_metrics(spark.sparkContext.uiWebUrl,
                                     spark.sparkContext.applicationId)
        # the measured workload: shuffle every row on the subject key
        n = keyed.repartition(8, *key).groupBy(*key).count().count()
        ui, app = spark.sparkContext.uiWebUrl, spark.sparkContext.applicationId
        write, _ = stage_metrics(ui, app)
        if mode == "dense":
            write -= pre_w
        results[mode] = {"groups": n, "shuffle_write_bytes": write}
        spark.stop()

    print(json.dumps({
        "sf_dir": sf_dir,
        "compressed": not os.environ.get("SHUFFLE_RAW"),
        **results,
        "hash_vs_raw": round(results["raw"]["shuffle_write_bytes"]
                             / max(1, results["hash"]["shuffle_write_bytes"]), 2),
        "dense_vs_raw": round(results["raw"]["shuffle_write_bytes"]
                              / max(1, results["dense"]["shuffle_write_bytes"]), 2),
        "dense_vs_hash": round(results["hash"]["shuffle_write_bytes"]
                               / max(1, results["dense"]["shuffle_write_bytes"]), 2),
    }))


if __name__ == "__main__":
    main()
