import sys

from dycoreplanet_tpu.cli.main import main

sys.exit(main())
