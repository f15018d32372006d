"""Logging helpers: JSON-lines stats stream + smoothed scalar windows.

Capability parity with ``detectron/utils/logging.py``: ``log_json_stats``
emits ``json_stats: {...}`` lines consumed by the learning-curve plotting
tools (``tools/visualize_learn.py``); ``SmoothedValue`` keeps median/average
over a deque window (reference lines 20-66). ``setup_logging`` configures the
root stream handler once.
"""

import json
import logging
import sys
from collections import deque

import numpy as np


def log_json_stats(stats, sort_keys=True):
    print('json_stats: {:s}'.format(
        json.dumps(stats, sort_keys=sort_keys, default=_json_default)))
    sys.stdout.flush()


def _json_default(o):
    if isinstance(o, (np.floating, np.integer)):
        return o.item()
    if isinstance(o, np.ndarray):
        return o.tolist()
    raise TypeError(repr(o) + ' is not JSON serializable')


class SmoothedValue(object):
    """Track a series of values and provide access to smoothed values over a
    window or the global series average (logging.py:41-66)."""

    def __init__(self, window_size):
        self.deque = deque(maxlen=window_size)
        self.series = []
        self.total = 0.0
        self.count = 0

    def AddValue(self, value):
        self.deque.append(value)
        self.series.append(value)
        self.count += 1
        self.total += value

    def GetMedianValue(self):
        return np.median(self.deque)

    def GetAverageValue(self):
        return np.mean(self.deque)

    def GetGlobalAverageValue(self):
        return self.total / max(self.count, 1)


def send_email(subject, body, to):
    """Best-effort notification email (logging.py:68-83; used by
    check_expected_results and the train wrapper scripts)."""
    import smtplib
    from email.mime.text import MIMEText
    try:
        msg = MIMEText(body)
        msg['Subject'] = subject
        msg['To'] = ', '.join(to) if isinstance(to, (list, tuple)) else to
        s = smtplib.SMTP('localhost')
        s.sendmail('detectron-tpu', msg['To'].split(', '), msg.as_string())
        s.quit()
        return True
    except Exception:
        logging.getLogger(__name__).info(
            'send_email failed (no local MTA?); subject was: %s', subject)
        return False


def setup_logging(name):
    FORMAT = '%(levelname)s %(filename)s:%(lineno)4d: %(message)s'
    # Set up the root logger only if not already configured (logging.py:70-83)
    if not logging.root.handlers:
        logging.basicConfig(level=logging.INFO, format=FORMAT,
                            stream=sys.stdout)
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    return logger
