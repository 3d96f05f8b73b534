"""Network functions under the reference's import path
(reference functions/net.py) — implementations live in uuid_net_util."""
from .uuid_net_util import (presigned_url, url_decode, url_encode, url_host,
                            url_path, url_query, url_scheme)

__all__ = ["presigned_url", "url_host", "url_path", "url_query",
           "url_scheme", "url_encode", "url_decode"]
