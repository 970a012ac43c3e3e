"""`recon`-compatible command line entry point.

Usage: python -m meshrecon.cli [OPTIONS] [INPUT_FILE]  (see pipeline/config.py
for the full flag surface, which mirrors configuration.cpp:109-123).
"""

from __future__ import annotations

import sys


def main(argv=None):
    from meshrecon.pipeline.config import config_from_args
    from meshrecon.pipeline.reconstruct import reconstruct

    config = config_from_args(argv)
    config.log(2, " Loaded configuration and video clip")
    if config.profile_dir:
        from meshrecon.utils.profiling import profile_trace

        with profile_trace(config.profile_dir):
            reconstruct(config)
    else:
        reconstruct(config)
    return 0


if __name__ == "__main__":
    sys.exit(main())
