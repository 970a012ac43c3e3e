"""`recon`-compatible command line entry point.

Usage: python -m meshrecon.cli [OPTIONS] [INPUT_FILE]  (see pipeline/config.py
for the full flag surface, which mirrors configuration.cpp:109-123).
"""

from __future__ import annotations

import sys



def _enable_compile_cache():
    """Persistent XLA compilation cache: repeated CLI/bench runs reuse
    executables instead of paying ~50 s/remote-AOT-compile per program shape."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/meshrecon_jax")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def main(argv=None):
    from meshrecon.pipeline.config import configs_from_args
    from meshrecon.pipeline.reconstruct import reconstruct, reconstruct_scenes
    from meshrecon.utils.tunnel import force_cpu_if_tunnel_dead

    # the axon plugin hangs backend init when its relay is down — fall
    # back to CPU with a warning rather than hang
    force_cpu_if_tunnel_dead()

    _enable_compile_cache()

    configs = configs_from_args(argv)
    from meshrecon.pipeline.config import apply_kernel_knobs

    apply_kernel_knobs(configs[0])
    configs[0].log(2, " Loaded configuration and video clip")

    def run():
        if len(configs) == 1:
            reconstruct(configs[0])
        else:
            reconstruct_scenes(configs,
                               scene_devices=configs[0].scene_devices)

    if configs[0].profile_dir:
        from meshrecon.utils.profiling import profile_trace

        with profile_trace(configs[0].profile_dir):
            run()
    else:
        run()
    return 0


if __name__ == "__main__":
    sys.exit(main())
