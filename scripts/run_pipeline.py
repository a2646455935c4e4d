"""spark-submit entry point: run (or resume) the extraction pipeline.

    spark-submit --py-files pdf_ai_mapper_spark.zip \
        scripts/run_pipeline.py <input_parquet> <output_path>

Reads the web_pages-shaped input table, runs doctype sniff → extract →
preprocess → md5 → dedup, writes bucketed parquet with per-bucket
lineage, resuming from the last committed bucket set. Prints one JSON
line of run stats.
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession


def main(argv: list[str]) -> int:
    if len(argv) != 3:
        print(__doc__, file=sys.stderr)
        return 2
    _, input_path, output_path = argv

    from pdf_ai_mapper_spark.config import DEFAULT_CONFIG
    from pdf_ai_mapper_spark.pipeline import run_extraction

    spark = SparkSession.builder.appName('pdf-ai-mapper-extract').getOrCreate()
    spark.conf.set('spark.sql.session.timeZone', 'UTC')
    stats = run_extraction(spark, spark.read.parquet(input_path),
                           output_path, DEFAULT_CONFIG)
    print(json.dumps(stats))
    spark.stop()
    return 0


if __name__ == '__main__':
    sys.exit(main(sys.argv))
