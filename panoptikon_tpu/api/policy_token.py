"""HMAC policy tokens for server-side rendering.

The reference mints HMAC-SHA256 tokens binding a policy name + expiry so
its SSR layer can make API calls under the requester's policy without
cookies (src/policy_token.rs; format per docs/architecture.md:84-99).
Token shape: ``base64url(policy|expires_unix|hex(hmac_sha256(key,
policy|expires_unix)))``.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import secrets
import time
from typing import Optional


class TokenKey:
    def __init__(self, key: Optional[bytes] = None):
        self.key = key or secrets.token_bytes(32)

    def mint(self, policy: str, ttl_seconds: int = 300) -> str:
        expires = int(time.time()) + ttl_seconds
        payload = f"{policy}|{expires}"
        mac = hmac.new(self.key, payload.encode(), hashlib.sha256).hexdigest()
        return base64.urlsafe_b64encode(f"{payload}|{mac}".encode()).decode()

    def verify(self, token: str) -> Optional[str]:
        """Returns the policy name when valid and unexpired, else None."""
        try:
            payload = base64.urlsafe_b64decode(token.encode()).decode()
            policy, expires_s, mac = payload.rsplit("|", 2)
        except Exception:
            return None
        expected = hmac.new(
            self.key, f"{policy}|{expires_s}".encode(), hashlib.sha256
        ).hexdigest()
        if not hmac.compare_digest(mac, expected):
            return None
        try:
            if int(expires_s) < time.time():
                return None
        except ValueError:
            return None
        return policy
