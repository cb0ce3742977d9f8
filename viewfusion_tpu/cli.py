"""Command-line entry point, flag-compatible with the reference
(main.py:6-36): -c/--config, -s/--src, -g/--gpu (accepted; device choice
is JAX's), -t/--train, -e/--eval, -r/--resume, --wandb, -i/--inference,
-ar/--autoregressive, -gif/--generate_gifs, -ex/--extrapolate."""

from __future__ import annotations

import argparse
import io


def get_arg_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", type=str, help="YAML config file")
    parser.add_argument("-s", "--src", type=str, default=None)
    parser.add_argument("-g", "--gpu", action="store_true", default=False,
                        help="accepted for reference-CLI parity; JAX "
                        "selects TPU/CPU automatically")
    parser.add_argument("-t", "--train", action="store_true", default=False)
    parser.add_argument("-e", "--eval", action="store_true", default=False)
    parser.add_argument("-r", "--resume", action="store_true", default=False)
    parser.add_argument("--wandb", action="store_true",
                        help="Log run to Weights and Biases.")
    parser.add_argument("-i", "--inference", action="store_true",
                        default=False)
    parser.add_argument("-ar", "--autoregressive", action="store_true",
                        default=False)
    parser.add_argument("-gif", "--generate_gifs", action="store_true",
                        default=False)
    parser.add_argument("-ex", "--extrapolate", action="store_true",
                        default=False)
    return parser


def _honor_platform_env() -> None:
    """Re-apply $JAX_PLATFORMS after import.

    Some images preload jax via sitecustomize and pin ``jax_platforms``
    (e.g. to a tunneled TPU), which silently overrides the user's shell
    ``JAX_PLATFORMS=cpu``.  Restore the standard env-var contract so CPU
    smoke runs really run on CPU."""
    import os

    want = os.environ.get("JAX_PLATFORMS")
    if want:
        import jax

        jax.config.update("jax_platforms", want)


def _enable_hang_diagnostics() -> None:
    """SIGUSR1 dumps every thread's Python stack to stderr.

    Long runs on a tunneled accelerator can wedge host-side (observed:
    an eval blocked ~30 min in a futex with near-zero CPU).  With no
    py-spy/gdb in the image, stdlib faulthandler is the diagnostic:
    ``kill -USR1 <pid>`` prints all stacks without killing the run.
    """
    import faulthandler
    import signal

    try:
        # chain=False: chaining would re-invoke the prior disposition,
        # and for SIG_DFL that terminates the process after the dump
        # (observed killing a live server) — the opposite of the point.
        faulthandler.register(signal.SIGUSR1, all_threads=True,
                              chain=False)
    except (AttributeError, ValueError, io.UnsupportedOperation):
        pass  # non-main thread, no SIGUSR1 (windows), or no real stderr


def main(args=None) -> None:
    if args is None:
        args = get_arg_parser().parse_args()

    _enable_hang_diagnostics()
    _honor_platform_env()
    from viewfusion_tpu.parallel.mesh import initialize_distributed
    from viewfusion_tpu.training.trainer import Experiment
    from viewfusion_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    initialize_distributed()
    experiment = Experiment(args)
    if args.train:
        experiment.train()
    if args.eval:
        experiment.eval()
    if args.inference:
        experiment.inference()


if __name__ == "__main__":
    main()
