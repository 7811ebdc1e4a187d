"""Direct memory-bandwidth-ceiling experiment for the code-KG scaling
attribution (BASELINE.md).

The code-KG pipeline's 2->8-core scaling reads below the FOXML
extractor's even after the round-5 single-content-scan fusion. The
attribution (shared-socket memory/allocator saturation by JVM row and
shuffle traffic, not a plan defect) was previously inferred from
per-stage CPU inflation; this script demonstrates it directly with two
jobs that contain NONE of the repo's operators:

- control ``compute``: 64 chained sha2 hashes over the source's content
  column, summed — heavy CPU per row, near-zero allocation, no
  exchange. This is the shape of the FOXML extraction stage that reads
  0.85-0.89.
- probe ``exchange``: the same rows exploded to code-KG-state-row
  granularity (52 narrow string rows per file), pushed through ONE
  hash repartition and counted — near-zero compute, all cost is row
  materialization + shuffle serialize/deserialize, i.e. pure memory
  traffic. No regex, no UDF, no repo code.

If ``compute`` scales well while ``exchange`` does not, the ceiling is
the box's memory subsystem: every shuffle-carrying JVM stage hits it at
high core counts regardless of operator quality, and a real 4x cluster
(4x memory channels, 4x shuffle NICs/disks) does not share it.

Usage (pin cores exactly like bench.py --scaling):
    taskset -c 0-1 python tools/bandwidth_ceiling.py 2
    taskset -c 0-7 python tools/bandwidth_ceiling.py 8
Prints one JSON line per run; compute efficiency as
(rows_per_sec_hi / rows_per_sec_lo) / (hi / lo) per job.
"""

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from bench import _materialize, _steal_jiffies  # noqa: E402
from fcrepo3_rdf_extractor_spark.queries import _src_files_df  # noqa: E402
from fcrepo3_rdf_extractor_spark.session import build_session  # noqa: E402


def main() -> int:
    cores = int(sys.argv[1])
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    spark = build_session(f"ceiling-{cores}", cores=cores)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if copies > 1:
        docs = (
            docs.withColumn("_c", F.explode(F.lit(list(range(copies)))))
            .withColumn("doc_id", F.col("doc_id") * copies + F.col("_c"))
            .drop("_c")
        )
    source = (
        _src_files_df(docs, calls=True).repartition(cores * 4).persist()
    )
    n = source.count()

    # compute control: 8 chained sha2 rounds, no exchange
    h = F.col("content")
    for _ in range(64):
        h = F.sha2(h, 256)
    compute = source.select(F.sum(F.length(h)).alias("s"))

    # exchange probe: ~13 narrow rows per file through one repartition
    narrow = source.select(
        "repo",
        "path",
        "commit",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(51)),
                lambda i: F.concat(
                    F.col("path"), F.lit("#"), i.cast("string")
                ),
            )
        ).alias("k"),
    ).repartition(cores * 4, "k")
    exchange = narrow

    out = {"cores": cores, "files": n, "copies": copies}
    for label, df in (("compute", compute), ("exchange", exchange)):
        _materialize(df)  # untimed codegen pass
        best, times = None, []
        s0 = _steal_jiffies()
        for _ in range(3):
            t0 = time.perf_counter()
            _materialize(df)
            dt = round(time.perf_counter() - t0, 3)
            times.append(dt)
            best = dt if best is None or dt < best else best
        out[label + "_sec"] = best
        out[label + "_times"] = times
        out[label + "_steal_cpu_sec"] = round(
            (_steal_jiffies() - s0) / 100.0, 1
        )
    spark.stop()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
