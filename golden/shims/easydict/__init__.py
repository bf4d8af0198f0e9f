"""Minimal easydict shim: dict with recursive attribute access."""


class EasyDict(dict):
    def __init__(self, d=None, **kwargs):
        super().__init__()
        if d is None:
            d = {}
        d = dict(d, **kwargs)
        for k, v in d.items():
            setattr(self, k, v)

    def __setattr__(self, name, value):
        if isinstance(value, dict) and not isinstance(value, EasyDict):
            value = EasyDict(value)
        elif isinstance(value, (list, tuple)):
            value = type(value)(
                EasyDict(x) if isinstance(x, dict) and not isinstance(x, EasyDict) else x
                for x in value
            )
        super().__setattr__(name, value)
        self[name] = value

    __getattr__ = dict.__getitem__
