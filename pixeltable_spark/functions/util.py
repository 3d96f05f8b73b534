"""Utility functions under the reference's import path
(reference functions/util.py) — implementations live in uuid_net_util."""
from .uuid_net_util import (coalesce, get_media_metadata, greatest, ifnull,
                            least, md5_hex, normalize_image_mode,
                            resolve_torch_device)

# the reference's name for the container-metadata probe
get_metadata = get_media_metadata

__all__ = ["get_metadata", "get_media_metadata", "normalize_image_mode",
           "resolve_torch_device", "coalesce", "greatest", "least",
           "ifnull", "md5_hex"]
