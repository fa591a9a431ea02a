"""Structured run logging (reference: utils.py:90-119 LoggerDecorator).

Wraps an entry point with file logging and wall-clock timing, writing the
run configuration and elapsed time to ``logger.log`` in the snapshot
directory (the reference logs this as "Compiling time", utils.py:113).
"""

from __future__ import annotations

import datetime
import functools
import logging
import time


class LoggerDecorator:
    def __init__(self, log_file: str, level: int = logging.INFO):
        self.log_file = log_file
        self.level = level

    def __call__(self, func):
        @functools.wraps(func)
        def wrapper(*args, **kwargs):
            logger = logging.getLogger("nasa_niswan_tpu")
            logger.setLevel(self.level)
            handler = logging.FileHandler(self.log_file)
            handler.setFormatter(
                logging.Formatter("%(levelname)s %(asctime)s %(message)s")
            )
            logger.addHandler(handler)
            tic = time.time()
            try:
                result = func(*args, **kwargs)
            finally:
                elapsed = str(datetime.timedelta(seconds=time.time() - tic))
                logger.info(
                    f"Run configuration: {args, kwargs}, Elapsed time: {elapsed}"
                )
                logger.removeHandler(handler)
            return result

        return wrapper


def run_logger(name: str = "nasa_niswan_tpu") -> logging.Logger:
    return logging.getLogger(name)
