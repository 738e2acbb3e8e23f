from s3spark.cli import main

import sys

sys.exit(main())
