"""Completion test CLI — drop-in for the reference entrypoint
(``completion/test.py:67-82``): writes results.h5 + submission.zip."""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mvp_benchmark_tpu.train.config import load_config
from mvp_benchmark_tpu.train.submission import run_completion_test


def main():
    parser = argparse.ArgumentParser(description="Test config file")
    parser.add_argument("-c", "--config", help="path to config file",
                        required=True)
    parser.add_argument("--data-dir", default=None)
    arg = parser.parse_args()
    args = load_config(arg.config)

    if args.load_model:
        log_dir = os.path.dirname(args.load_model)
    else:
        exp_name = f"{args.model_name}_{args.loss}_{args.flag}_test"
        log_dir = os.path.join(args.work_dir, exp_name)
        os.makedirs(log_dir, exist_ok=True)

    logging.basicConfig(
        level=logging.INFO,
        handlers=[
            logging.FileHandler(os.path.join(log_dir, "test.log")),
            logging.StreamHandler(sys.stdout),
        ],
    )
    logging.info(str(args))
    data_dir = arg.data_dir or os.path.join(os.path.dirname(__file__), "data")
    zip_path, results = run_completion_test(args, log_dir, data_dir)
    logging.info("wrote %s (results %s)", zip_path, results.shape)


if __name__ == "__main__":
    main()
