"""Pure-python helper utilities.

Capability parity with the reference's helper layer
(/root/reference/imagen_pytorch/imagen_pytorch.py:29-126), re-expressed without torch.
These are config-time helpers only; tensor-touching helpers live in
`imagen_tpu.ops.tensor_utils` as jnp functions.
"""
from functools import wraps


def exists(val):
    return val is not None


def default(val, d):
    if exists(val):
        return val
    return d() if callable(d) else d


def identity(t, *args, **kwargs):
    return t


def divisible_by(numer, denom):
    return (numer % denom) == 0


def first(arr, d=None):
    if len(arr) == 0:
        return d
    return arr[0]


def maybe(fn):
    @wraps(fn)
    def inner(x):
        if not exists(x):
            return x
        return fn(x)
    return inner


def once(fn):
    called = False

    @wraps(fn)
    def inner(x):
        nonlocal called
        if called:
            return
        called = True
        return fn(x)
    return inner


print_once = once(print)


def cast_tuple(val, length=None):
    if isinstance(val, list):
        val = tuple(val)

    output = val if isinstance(val, tuple) else ((val,) * default(length, 1))

    if exists(length):
        assert len(output) == length, f'tuple of length {len(output)} does not match expected length {length}'

    return output


def compact(input_dict):
    return {key: value for key, value in input_dict.items() if exists(value)}


def maybe_transform_dict_key(input_dict, key, fn):
    if key not in input_dict:
        return input_dict

    copied_dict = input_dict.copy()
    copied_dict[key] = fn(copied_dict[key])
    return copied_dict


def pad_tuple_to_length(t, length, fillvalue=None):
    remain_length = length - len(t)
    if remain_length <= 0:
        return t
    return (*t, *((fillvalue,) * remain_length))


def safe_get_tuple_index(tup, index, default=None):
    if len(tup) <= index:
        return default
    return tup[index]


def stage_progress(iterable, *, enabled, desc, total=None):
    """Per-STAGE progress bar for the cascade host loops (reference tqdm-wraps
    its unet cascade, imagen_pytorch.py:2408). Per-step progress is impossible
    here — each stage is one compiled scan — but the stage loop is host-side
    and free to report. No-op passthrough when disabled or tqdm is absent."""
    if not enabled:
        return iterable
    try:
        from tqdm.auto import tqdm
    except ImportError:
        return iterable
    return tqdm(iterable, desc=desc, unit='stage', total=total, leave=False)
