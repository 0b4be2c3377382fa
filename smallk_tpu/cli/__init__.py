"""Command-line tools.

`run_cli` is the process exit boundary: it maps Python exceptions onto
the reference's Result codes (common/include/nmf.hpp:17-26), which are
the reference mains' int-return contract — argument and validation
errors exit Result.BAD_PARAM, overflow/size failures
Result.SIZE_TOO_LARGE, anything else Result.FAILURE.
"""

from __future__ import annotations

import sys


def run_cli(main, argv=None) -> int:
    """Run a CLI main() and translate its outcome to a Result code."""
    from ..common.options import Result

    try:
        rc = main(argv)
        return int(Result.OK if rc in (0, None) else Result(rc))
    except SystemExit as e:  # argparse --help (0) or usage errors (2)
        if e.code in (0, None):
            return int(Result.OK)
        return int(Result.BAD_PARAM)
    except (ValueError, KeyError, FileNotFoundError, IsADirectoryError,
            PermissionError) as e:
        print(f"error: {e}", file=sys.stderr)
        return int(Result.BAD_PARAM)
    except (MemoryError, OverflowError) as e:
        print(f"error: {e}", file=sys.stderr)
        return int(Result.SIZE_TOO_LARGE)
    except KeyboardInterrupt:
        raise
    except Exception as e:
        print(f"error: {type(e).__name__}: {e}", file=sys.stderr)
        return int(Result.FAILURE)


def add_common_flags(parser) -> None:
    """Flags shared by all five tools (extensions beyond the reference)."""
    parser.add_argument(
        "--compile-cache", default="", metavar="DIR",
        help="persist compiled XLA programs under DIR so repeat runs "
             "skip cold-start compilation (same as the "
             "SMALLK_TPU_COMPILE_CACHE env var)",
    )


def apply_common_flags(args) -> None:
    import os

    path = getattr(args, "compile_cache", "")
    if path:
        os.environ["SMALLK_TPU_COMPILE_CACHE"] = path
        import smallk_tpu

        smallk_tpu._enable_compile_cache()
