"""spark-submit entry script: the driver file named on the spark-submit
command line, with the package itself shipped via --py-files.

    spark-submit --master <cluster> \
        --py-files dist/fastqdedup_spark.zip \
        scripts/submit_main.py \
        --input <files table> --output <deduped table> [knobs...]

spark-submit prepends the --py-files archives to every executor's AND
the driver's sys.path, so `fastqdedup_spark` here resolves from the
shipped zip — no install step on the cluster.
"""

from fastqdedup_spark.cli import main

if __name__ == "__main__":
    main()
