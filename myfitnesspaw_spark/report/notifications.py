"""Failure notifications — Slack block-kit payloads on flow failure.

Reference parity: the reference ships a block-kit JSON template posted
when a Prefect flow run fails
(`/root/reference/templates/slack_notifications.py:1-43` — header,
summary, project/flow fields, message, branded context).  SURVEY §2.10
maps it to a query-listener hook outside the engine core; this module
is that hook, engine-side and transport-injectable so tests never
touch the network (same discipline as ``report/email.py``):

- :func:`build_failure_payload` assembles the block-kit structure
  programmatically (dicts, not string templating) with the same
  information slots: project, flow, failure message.
- :func:`notify_on_failure` wraps any BATCH driver-side flow: on an
  exception it posts the payload and re-raises — the engine analogue
  of Prefect's flow-level state handler.
- :class:`FailureNotificationListener` is a
  ``StreamingQueryListener`` (pure-Python, Spark 3.4+): a streaming
  query that terminates WITH an exception posts the payload from the
  listener bus — the `onQueryTermination` shape SURVEY §2.10 names.

A real deployment passes ``transport=`` an HTTP poster for the Slack
webhook; the default collects payloads in-memory.
"""

from __future__ import annotations

from collections.abc import Callable
from contextlib import contextmanager

from pyspark.sql.streaming.listener import StreamingQueryListener

Transport = Callable[[dict], None]

HEADER_TEXT = ":rotating_light: Engine Error Notification :rotating_light:"
SUMMARY_TEXT = (
    "*A flow execution resulted in a failure. Please check the details below:*"
)
FOOTER_TEXT = "Message delivered by *myfitnesspaw_spark* failure hook"


def build_failure_payload(project: str, flow: str, message: str) -> dict:
    """Block-kit payload with the reference's information slots
    (project, flow, failure message — `slack_notifications.py:22-28`)."""

    def _mrkdwn(text: str) -> dict:
        return {"type": "mrkdwn", "text": text}

    return {
        "blocks": [
            {
                "type": "header",
                "text": {"type": "plain_text", "text": HEADER_TEXT, "emoji": True},
            },
            {"type": "section", "text": _mrkdwn(SUMMARY_TEXT)},
            {
                "type": "section",
                "fields": [
                    _mrkdwn(f"project: `{project}`"),
                    _mrkdwn(f"flow: `{flow}`"),
                ],
            },
            {"type": "section", "text": _mrkdwn(f"message: `{message}`")},
            {"type": "divider"},
            {"type": "context", "elements": [_mrkdwn(FOOTER_TEXT)]},
            {"type": "divider"},
        ]
    }


class CollectingTransport:
    """Default transport: collects payloads (tests / dry runs)."""

    def __init__(self) -> None:
        self.payloads: list[dict] = []

    def __call__(self, payload: dict) -> None:
        self.payloads.append(payload)


@contextmanager
def notify_on_failure(project: str, flow: str, transport: Transport):
    """Post a failure payload if the wrapped block raises; re-raise.

    Notification delivery must never mask the original failure, so
    transport errors are swallowed.
    """
    try:
        yield
    except Exception as exc:
        try:
            transport(build_failure_payload(project, flow, f"{type(exc).__name__}: {exc}"))
        except Exception:
            pass
        raise


class FailureNotificationListener(StreamingQueryListener):
    """Posts a failure payload when a STREAMING query terminates with
    an exception.  Register once per session::

        listener = FailureNotificationListener("proj", transport)
        spark.streams.addListener(listener)
    """

    def __init__(self, project: str, transport: Transport) -> None:
        self.project = project
        self.transport = transport

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        # QueryTerminatedEvent carries only id/runId/exception — the
        # query NAME is not on the event, so the flow slot gets the id.
        if event.exception is not None:
            try:
                self.transport(
                    build_failure_payload(self.project, str(event.id), event.exception)
                )
            except Exception:
                pass
