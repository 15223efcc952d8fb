#!/usr/bin/env python
"""spark-submit entry shim: spark-submit needs a script file, not -m.

Usage:
  spark-submit --master <m> --py-files dist/remine_spark.zip \
      scripts/submit_main.py run --input <pages> --workdir <wd>
"""
import sys

from remine_spark.__main__ import main

sys.exit(main())
