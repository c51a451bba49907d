"""Registration training CLI — drop-in for the reference entrypoint
(``registration/train.py:184-202``): ``python train.py -c cfgs/<model>.yaml``.
"""

import argparse
import datetime
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mvp_benchmark_tpu.train.config import load_config
from mvp_benchmark_tpu.train.engine import train_registration


def main():
    parser = argparse.ArgumentParser(description="Train config file")
    parser.add_argument("-c", "--config", help="path to config file",
                        required=True)
    parser.add_argument("--data-dir", default=None,
                        help="override dataset directory (default ./data)")
    arg = parser.parse_args()
    args = load_config(arg.config)

    time = datetime.datetime.now().isoformat()[:19]
    if args.load_model:
        exp_name = os.path.basename(os.path.dirname(args.load_model))
        log_dir = os.path.dirname(args.load_model)
    else:
        exp_name = f"{args.model_name}_{args.benchmark}_{args.flag}_{time}"
        log_dir = os.path.join(args.work_dir, exp_name)
        os.makedirs(log_dir, exist_ok=True)

    logging.basicConfig(
        level=logging.INFO,
        handlers=[
            logging.FileHandler(os.path.join(log_dir, "train.log")),
            logging.StreamHandler(sys.stdout),
        ],
    )
    logging.info(str(args))
    data_dir = arg.data_dir or os.path.join(os.path.dirname(__file__), "data")
    train_registration(args, log_dir, data_dir=data_dir)


if __name__ == "__main__":
    main()
