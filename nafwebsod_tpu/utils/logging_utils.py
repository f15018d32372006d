"""Logging helpers: JSON-lines stats stream + smoothed scalar windows.

Capability parity with ``detectron/utils/logging.py``: ``log_json_stats``
emits ``json_stats: {...}`` lines consumed by the learning-curve plotting
tools (``tools/visualize_learn.py``); ``SmoothedValue`` exposes the same
median / window-average / global-average readings over a bounded window
(reference lines 20-66). Internals are this repo's own: the smoother keeps
one running (sum, count) pair instead of mirroring the reference's field
layout, and ``log_json_stats`` serializes numpy scalars/arrays directly
instead of pre-stringifying floats (full precision survives the round
trip; the consumer side parses either form). ``setup_logging`` configures
the root stream handler once instead of unconditionally replacing it.
"""

import json
import logging
import sys
from collections import deque


def _jsonable(value):
    """Coerce numpy scalars/arrays to plain Python for json.dumps."""
    item = getattr(value, 'item', None)
    if item is not None and getattr(value, 'ndim', 0) == 0:
        return item()
    tolist = getattr(value, 'tolist', None)
    if tolist is not None:
        return tolist()
    raise TypeError('{!r} is not JSON serializable'.format(value))


def log_json_stats(stats, sort_keys=True):
    line = json.dumps(stats, sort_keys=sort_keys, default=_jsonable)
    sys.stdout.write('json_stats: ' + line + '\n')
    sys.stdout.flush()


class SmoothedValue:
    """Scalar series with windowed median/mean plus a global mean
    (capability of logging.py:41-66)."""

    def __init__(self, window_size):
        self._window = deque(maxlen=window_size)
        self._history = []

    def AddValue(self, value):
        self._window.append(float(value))
        self._history.append(float(value))

    def GetMedianValue(self):
        ordered = sorted(self._window)
        k = len(ordered)
        mid = k // 2
        if k == 0:
            return float('nan')
        if k % 2:
            return ordered[mid]
        return 0.5 * (ordered[mid - 1] + ordered[mid])

    def GetAverageValue(self):
        # nan on an empty window like the reference's np.mean(empty deque)
        if not self._window:
            return float('nan')
        return sum(self._window) / len(self._window)

    def GetGlobalAverageValue(self):
        # the reference raises ZeroDivisionError before any AddValue; nan is
        # the same "obviously invalid" signal without the crash
        if not self._history:
            return float('nan')
        return sum(self._history) / len(self._history)

    @property
    def series(self):
        return self._history


def send_email(subject, body, to):
    """Best-effort notification email (logging.py:68-83; used by
    check_expected_results and the train wrapper scripts)."""
    import smtplib
    from email.mime.text import MIMEText
    try:
        recipients = list(to) if isinstance(to, (list, tuple)) else [to]
        msg = MIMEText(body)
        msg['Subject'] = subject
        msg['To'] = ', '.join(recipients)
        with smtplib.SMTP('localhost') as server:
            server.sendmail('detectron-tpu', recipients, msg.as_string())
        return True
    except Exception:
        logging.getLogger(__name__).info(
            'send_email failed (no local MTA?); subject was: %s', subject)
        return False


def setup_logging(name):
    # Configure the root logger once; later calls just hand out children
    # (the reference resets root handlers on every call, logging.py:70-83)
    if not logging.root.handlers:
        logging.basicConfig(
            level=logging.INFO,
            format='%(levelname)s %(filename)s:%(lineno)4d: %(message)s',
            stream=sys.stdout)
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    return logger
