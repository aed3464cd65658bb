"""``python -m mysql_streamer_spark`` — see cli.py for the subcommands."""

import sys

from mysql_streamer_spark.cli import main

sys.exit(main())
