"""UUID functions under the reference's import path
(reference functions/uuid.py) — implementations live in uuid_net_util."""
from .uuid_net_util import hex, is_uuid, to_string, uuid4, uuid5, uuid7

__all__ = ["uuid4", "uuid5", "uuid7", "to_string", "hex", "is_uuid"]
