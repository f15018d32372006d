"""Attribute dictionary used by the global config.

Capability parity with the reference's ``detectron/utils/collections.py``
(AttrDict with attribute-style access plus immutability support used by
``detectron/core/config.py:60-64``), re-implemented for the TPU rebuild.
"""


class AttrDict(dict):
    """Dict with attribute access and deep immutability toggling."""

    IMMUTABLE = "__immutable__"

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.__dict__[AttrDict.IMMUTABLE] = False

    def __getattr__(self, name):
        if name in self.__dict__:
            return self.__dict__[name]
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)

    def __setattr__(self, name, value):
        if self.__dict__[AttrDict.IMMUTABLE]:
            raise AttributeError(
                "Attempted to set {} to {}, but AttrDict is immutable".format(
                    name, value
                )
            )
        if name in self.__dict__:
            self.__dict__[name] = value
        else:
            self[name] = value

    def immutable(self, is_immutable):
        """Recursively set immutability on this dict and all child AttrDicts."""
        self.__dict__[AttrDict.IMMUTABLE] = is_immutable
        for v in self.__dict__.values():
            if isinstance(v, AttrDict):
                v.immutable(is_immutable)
        for v in self.values():
            if isinstance(v, AttrDict):
                v.immutable(is_immutable)

    def is_immutable(self):
        return self.__dict__[AttrDict.IMMUTABLE]
