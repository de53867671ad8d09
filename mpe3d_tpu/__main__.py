import sys

from mpe3d_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main())
