#!/usr/bin/env python
"""Delete experiment output dirs that have no surviving log file.

Capability parity with ``tools/delete_nolog_exp.py`` (reference :15-64): a
log under ``<exp_root>/_logs`` whose filename starts with an experiment id
marks that experiment dir as kept; every other dir under ``<exp_root>`` is
removed. Dry-run by default; pass ``--delete`` to actually remove.

Usage: python tools/delete_nolog_exp.py [exp_root=./experiments] [--delete]
"""

import os
import shutil
import sys


def kept_ids(log_dir):
    ids = set()
    if not os.path.isdir(log_dir):
        return ids
    for f in os.listdir(log_dir):
        if f.endswith('.log'):
            ids.add(f.split(' ')[0])
    return ids


def main():
    args = [a for a in sys.argv[1:] if a != '--delete']
    do_delete = '--delete' in sys.argv[1:]
    exp_root = args[0] if args else './experiments'
    log_dir = os.path.join(exp_root, '_logs')
    ids = kept_ids(log_dir)
    print('{} experiment ids have logs'.format(len(ids)))

    n_keep = n_del = 0
    for d in sorted(os.listdir(exp_root)) if os.path.isdir(exp_root) else []:
        path = os.path.join(exp_root, d)
        if not os.path.isdir(path) or d == '_logs':
            continue
        if d in ids:
            print('keeping ', d)
            n_keep += 1
        else:
            print('{}deleting'.format('' if do_delete else '[dry-run] '), d)
            n_del += 1
            if do_delete:
                shutil.rmtree(path)
    print('kept {}, deleted {}{}'.format(
        n_keep, n_del, '' if do_delete else ' (dry run; pass --delete)'))


if __name__ == '__main__':
    main()
