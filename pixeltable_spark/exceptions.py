"""Typed exception surface mirroring the reference's
``pixeltable/exceptions.py`` hierarchy (ErrorCode enum with stable
values + HTTP status + retryability; Error subclasses per failure
family), re-expressed minimally.

Compatibility note: the engine predates this module and raised builtins
(ValueError / FileNotFoundError) throughout; the typed classes subclass
those builtins, so ``except ValueError`` call sites and existing tests
keep working while new code can catch the reference-shaped types.
"""

from __future__ import annotations

import enum
from typing import Any


class ErrorCode(enum.Enum):
    """Stable error codes (reference exceptions.py:14-100 — value,
    http_status, is_retryable). Only the families the engine raises are
    carried; values match the reference's published ones."""

    http_status: int
    is_retryable: bool

    def __new__(cls, value: int, http_status: int, is_retryable: bool):
        obj = object.__new__(cls)
        obj._value_ = value
        obj.http_status = http_status
        obj.is_retryable = is_retryable
        return obj

    INTERNAL_ERROR = 0, 500, False
    GENERIC_USER_ERROR = 1, 400, False
    COLUMN_NOT_FOUND = 1000, 404, False
    PATH_NOT_FOUND = 1001, 404, False
    TABLE_NOT_FOUND = 1002, 404, False
    DIRECTORY_NOT_FOUND = 1003, 404, False
    INDEX_NOT_FOUND = 1004, 404, False
    FUNCTION_NOT_FOUND = 1005, 404, False
    COLUMN_ALREADY_EXISTS = 2000, 409, False
    PATH_ALREADY_EXISTS = 2001, 409, False
    INDEX_ALREADY_EXISTS = 2002, 409, False
    INVALID_COLUMN_NAME = 3000, 422, False
    INVALID_PATH = 3001, 422, False
    INVALID_EXPRESSION = 3002, 422, False
    INVALID_TYPE = 3003, 422, False
    INVALID_SCHEMA = 3004, 422, False
    INVALID_ARGUMENT = 3005, 422, False
    MISSING_REQUIRED = 3007, 422, False
    TYPE_MISMATCH = 3008, 422, False
    CONSTRAINT_VIOLATION = 3009, 422, False
    UNSUPPORTED_OPERATION = 3010, 400, False
    INVALID_STATE = 3011, 400, False
    INVALID_CONFIGURATION = 3013, 422, False
    INSUFFICIENT_PRIVILEGES = 4000, 403, False
    MISSING_CREDENTIALS = 4001, 403, False
    PROVIDER_ERROR = 5000, 502, True
    RATE_LIMITED = 5001, 429, True
    PROVIDER_AUTH_ERROR = 5002, 401, False
    DATABASE_UNAVAILABLE = 6000, 503, True
    STORE_UNAVAILABLE = 6001, 503, True
    SERIALIZATION_FAILURE = 7000, 409, True
    CONCURRENT_MODIFICATION = 7001, 409, True


class Error(Exception):
    """Base engine error (reference Error). Carries an optional
    ErrorCode; str() is just the message, matching the reference."""

    default_code: ErrorCode = ErrorCode.GENERIC_USER_ERROR

    def __init__(self, *args: Any):
        # accept (code, msg) like the reference, or just (msg)
        if args and isinstance(args[0], ErrorCode):
            self.code = args[0]
            args = args[1:]
        else:
            self.code = self.default_code
        super().__init__(*args)


class NotFoundError(Error, ValueError):
    default_code = ErrorCode.PATH_NOT_FOUND


class AlreadyExistsError(Error, ValueError):
    default_code = ErrorCode.PATH_ALREADY_EXISTS


class RequestError(Error, ValueError):
    default_code = ErrorCode.INVALID_ARGUMENT


class ConcurrencyError(Error, RuntimeError):
    default_code = ErrorCode.CONCURRENT_MODIFICATION


class ExternalServiceError(Error, RuntimeError):
    default_code = ErrorCode.PROVIDER_ERROR


class AuthorizationError(Error, PermissionError):
    default_code = ErrorCode.INSUFFICIENT_PRIVILEGES


class ServiceUnavailableError(Error, RuntimeError):
    default_code = ErrorCode.DATABASE_UNAVAILABLE


class EngineWarning(UserWarning):
    """Reference: PixeltableWarning."""


# reference-name alias (reference exceptions.py:313)
PixeltableWarning = EngineWarning
