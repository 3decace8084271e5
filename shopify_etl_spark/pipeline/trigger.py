"""Post-pipeline BI refresh trigger (O7) — the engine-side analog of the
reference's Power BI dataset refresh (reference trigger_pbi.py:9-37:
acquire token, POST to the dataset ``/refreshes`` endpoint, 202 = queued).

Engine stance mirrors S7: no credential acquisition in engine code — the
caller passes the endpoint URL and an opaque bearer token (how the token
is minted — MSAL, workload identity, a secret manager — is a deployment
concern). The POST itself is stdlib urllib, with bounded retries and
backoff (the reference wraps the whole pipeline in a 2-attempt retry
loop; a refresh kick deserves the same resilience instead of failing the
run on one 5xx).
"""

from __future__ import annotations

import time


def trigger_bi_refresh(
    url: str,
    token: str | None = None,
    retries: int = 3,
    backoff_s: float = 0.5,
    timeout_s: float = 10.0,
) -> dict:
    """POST to a refresh webhook; returns {'ok', 'status', 'attempts'}.

    Success = any 2xx (the Power BI endpoint answers 202 Accepted —
    refresh is queued, not complete). Non-2xx and transport errors retry
    with linear backoff up to ``retries`` total attempts; the result is
    reported, never raised — a BI kick failing must not fail (or re-run)
    an already-committed pipeline, matching the reference where the
    refresh is a separate post-pipeline step.
    """
    import urllib.error
    import urllib.request

    headers = {"Content-Type": "application/json"}
    if token:
        headers["Authorization"] = f"Bearer {token}"
    status = None
    for attempt in range(1, max(retries, 1) + 1):
        try:
            req = urllib.request.Request(url, data=b"{}", headers=headers)
            with urllib.request.urlopen(req, timeout=timeout_s) as resp:
                status = resp.status
        except urllib.error.HTTPError as e:
            status = e.code
        except OSError:
            status = None  # connection-level failure
        if status is not None and 200 <= status < 300:
            return {"ok": True, "status": status, "attempts": attempt}
        if attempt <= retries - 1:
            time.sleep(backoff_s * attempt)
    return {"ok": False, "status": status, "attempts": max(retries, 1)}
