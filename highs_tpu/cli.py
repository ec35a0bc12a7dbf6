"""Command-line interface.

Equivalent of the reference CLI (app/RunHighs.cpp:42-139 +
app/HighsRuntimeOptions.h): reads a model, applies command-line /
options-file options, solves, and reports with the reference's exact
output format (Highs.cpp:5020-5061 reportSolvedLpQpStats), so scripts
and the reference's instance-test expectations
("Model status        : Optimal", "Objective value     : %17.10e")
work unchanged.
"""
from __future__ import annotations

import argparse
import sys
from typing import List, Optional

from .constants import HighsModelStatus, HighsStatus, \
    model_status_to_string
from .highs import Highs
from .options import HighsOptions


def build_arg_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="highs_tpu",
        description="TPU-native LP/QP/MIP solver with the capabilities "
                    "of HiGHS")
    parser.add_argument("model_file", nargs="?",
                        help="File of model to solve")
    parser.add_argument("--options_file", help="File containing HiGHS "
                        "options")
    parser.add_argument("--read_solution_file",
                        help="File of solution to read")
    parser.add_argument("--read_basis_file", help="File of basis to read")
    parser.add_argument("--write_model_file", help="File for writing out "
                        "the model")
    parser.add_argument("--solution_file", help="File for writing out "
                        "the solution")
    parser.add_argument("--write_basis_file", help="File for writing out "
                        "the basis")
    parser.add_argument("--presolve", help="Set presolve option to: "
                        '"choose" (default), "on" or "off"')
    parser.add_argument("--solver", help="Set solver option")
    parser.add_argument("--parallel", help="Set parallel option")
    parser.add_argument("--run_crossover", help="Set run_crossover "
                        "option")
    parser.add_argument("--time_limit", type=float,
                        help="Run time limit (seconds)")
    parser.add_argument("--random_seed", type=int, help="Seed to "
                        "initialize random number generation")
    parser.add_argument("--ranging", help="Compute cost, bound, RHS "
                        "ranging: on | off")
    parser.add_argument("--version", "-v", action="store_true",
                        help="Print version")
    return parser


def main(argv: Optional[List[str]] = None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    # accept arbitrary --option=value pairs for any registered option
    parser = build_arg_parser()
    known, unknown = parser.parse_known_args(argv)

    h = Highs()

    if known.version:
        print(f"highs_tpu version {h.version()}")
        return 0

    if known.options_file:
        if h.readOptions(known.options_file) == HighsStatus.kError:
            print(f"Error loading options file {known.options_file}")
            return 1

    for name in ("presolve", "solver", "parallel", "run_crossover",
                 "time_limit", "random_seed", "ranging",
                 "solution_file", "write_model_file", "write_basis_file",
                 "read_solution_file", "read_basis_file"):
        value = getattr(known, name, None)
        if value is not None:
            h.setOptionValue(name, value)

    extra = []
    for tok in unknown:
        if tok.startswith("--") and "=" in tok:
            name, _, value = tok[2:].partition("=")
            if h.setOptionValue(name, value) != HighsStatus.kOk:
                print(f"Unknown or invalid option {name}={value}")
                return 1
        else:
            extra.append(tok)
    if extra:
        print(f"Unrecognized arguments: {' '.join(extra)}")
        return 1

    if not known.model_file:
        print("ERROR: no model file specified")
        parser.print_usage()
        return 1

    if h.readModel(known.model_file) != HighsStatus.kOk:
        print(f"Error loading file {known.model_file}")
        return 1

    h.run()
    h.reportSolvedStats()

    if h.getOptionValue("write_model_file"):
        h.writeModel(h.getOptionValue("write_model_file"))
    if h.getOptionValue("solution_file"):
        h.writeSolution(h.getOptionValue("solution_file"),
                        h.getOptionValue("write_solution_style"))
    return 0


if __name__ == "__main__":
    sys.exit(main())
