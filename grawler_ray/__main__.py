import sys

from grawler_ray.cli import main

sys.exit(main())
