import sys

from krylov_tpu.cli import main

sys.exit(main())
