#!/usr/bin/env python
"""Entropy sanity demo (capability parity with ``tools/ShannonEntropy.py``):
prints the Shannon entropy and its normalized complement (1 - H/logN) for a
few synthetic score distributions — the quantity behind the noise-aware
spatial-entropy weighting (ops/entropy.py)."""

import math


def entropy(ps):
    h = sum(-p * math.log(p) for p in ps)
    print(h)
    print(1 - h / math.log(len(ps)))


def get_data(values, numbers):
    print(values, numbers)
    a = []
    for v, n in zip(values, numbers):
        a += [1.0 * v / n] * n
    return a


def main():
    cases = [
        ([1.0], [2000]),
        ([0.1, 0.9], [1000, 1000]),
        ([0.1, 0.9], [1900, 100]),
        ([0.1, 0.9], [1990, 10]),
        ([0.1, 0.9], [1999, 1]),
        ([0.5, 0.5], [1000, 1000]),
        ([0.9, 0.1], [1000, 1000]),
    ]
    for values, numbers in cases:
        print('-' * 56)
        a = get_data(values, numbers)
        print(len(a))
        print(sum(a))
        entropy(a)


if __name__ == '__main__':
    main()
