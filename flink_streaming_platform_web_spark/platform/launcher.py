"""spark-submit primary resource.

spark-submit launches a FILE, not a Python module (`-m` is not a
spark-submit flag — SparkSubmitOptionParser rejects any option before
the primary resource). This file is that resource: it delegates to the
platform CLI, so the cluster driver runs the same code path as a local
`python -m ...cli run`. The package itself ships via --py-files
(platform/submit.py wires both)."""

import sys

from flink_streaming_platform_web_spark.platform.cli import main

if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
