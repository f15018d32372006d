"""Pickle / file IO helpers (reference: ``detectron/utils/io.py``).

Keeps the reference's public pickle-based artifact formats (checkpoints,
``detections.pkl``, proposal files) readable and writable.
"""

import hashlib
import os
import pickle


def save_object(obj, file_name):
    """Serialize a Python object with pickle (protocol 2 for compat)."""
    file_name = os.path.abspath(file_name)
    os.makedirs(os.path.dirname(file_name), exist_ok=True)
    with open(file_name, 'wb') as f:
        pickle.dump(obj, f, protocol=2)


def load_object(file_name):
    with open(file_name, 'rb') as f:
        return pickle.load(f, encoding='latin1')


def get_file_md5(file_name):
    md5 = hashlib.md5()
    with open(file_name, 'rb') as f:
        for chunk in iter(lambda: f.read(1 << 20), b''):
            md5.update(chunk)
    return md5.hexdigest()


def cache_url(url_or_file, cache_dir):
    """Download `url_or_file` into the cache if it is a URL; identity otherwise.

    Network egress is typically unavailable on the training hosts, so URLs that
    are not already cached raise a clear error instead of attempting a fetch.
    """
    if not (url_or_file.startswith('http://') or url_or_file.startswith('https://')):
        return url_or_file
    fname = os.path.join(cache_dir, url_or_file.split('://', 1)[1])
    if os.path.exists(fname):
        return fname
    raise IOError(
        'URL {} is not cached at {} and downloading is disabled'.format(url_or_file, fname)
    )
