import sys

from tpuao.cli import main

sys.exit(main())
