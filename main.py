"""spark-submit entry point: spark-submit --py-files mantic_sh_spark.zip main.py <cmd> ..."""

import sys

from mantic_sh_spark.cli import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
