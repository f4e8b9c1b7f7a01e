#!/usr/bin/env python
"""spark-submit launcher: package-relative imports don't work for a
file run as a bare script, so this shim is what you pass to
spark-submit, with the package shipped via --py-files:

    python -m zipfile -c rollup_engine.zip rollup_engine
    spark-submit --py-files rollup_engine.zip scripts/submit_job.py \
        --transcripts /data/turns --out /data/rollups
"""

from rollup_engine.job import main

if __name__ == "__main__":
    main()
