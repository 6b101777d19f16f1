"""K7: HTML email delivery with a pluggable SMTP transport.

Engine twin of the reference's email task
(`/root/reference/myfitnesspaw/tasks.py:131-233`, used at
`tasks.py:732-743`): a multipart message carrying the plain-text part
first and the HTML part last (clients render the last part they
support), optional CC/BCC, and file attachments encoded base64 with a
``Content-ID`` header so the progress-chart PNG can be referenced
inline from the HTML (``<img src="cid:...">``).

Delivery is behind an injectable transport factory: production uses
:func:`smtp_transport` (the reference's SSL / STARTTLS branch pair,
`tasks.py:220-233`); tests inject a recorder.  This is driver-side
presentation — nothing here touches Spark.
"""

from __future__ import annotations

import smtplib
import ssl
from dataclasses import dataclass, field
from email import encoders
from email.mime.base import MIMEBase
from email.mime.multipart import MIMEMultipart
from email.mime.text import MIMEText
from typing import Callable, Protocol


class Transport(Protocol):
    """Minimal SMTP surface the sender needs (matched by smtplib)."""

    def login(self, username: str, password: str) -> object: ...

    def send_message(self, message: MIMEMultipart) -> object: ...

    def quit(self) -> object: ...


@dataclass
class Attachment:
    """One file attachment; ``content_id`` enables inline-image use."""

    filename: str
    payload: bytes
    content_id: str | None = None


@dataclass
class EmailReport:
    subject: str
    email_to: str
    email_from: str = "reporter@example.invalid"
    html: str | None = None
    plain: str | None = None
    email_to_cc: str | None = None
    email_to_bcc: str | None = None
    attachments: list[Attachment] = field(default_factory=list)

    def build_message(self) -> MIMEMultipart:
        """Assemble the MIME message exactly as the reference does
        (`tasks.py:190-218`): headers, plain-then-HTML text parts,
        base64 octet-stream attachments with Content-Disposition and
        Content-ID headers."""
        message = MIMEMultipart()
        message["Subject"] = self.subject
        message["From"] = self.email_from
        message["To"] = self.email_to
        if self.email_to_cc:
            message["Cc"] = self.email_to_cc
        if self.email_to_bcc:
            message["Bcc"] = self.email_to_bcc
        if self.plain:
            message.attach(MIMEText(self.plain, "plain"))
        if self.html:
            message.attach(MIMEText(self.html, "html"))
        for att in self.attachments:
            part = MIMEBase("application", "octet-stream")
            part.set_payload(att.payload)
            encoders.encode_base64(part)
            part.add_header(
                "Content-Disposition", f"attachment; filename= {att.filename}"
            )
            if att.content_id:
                part.add_header("Content-ID", f"<{att.content_id}>")
            message.attach(part)
        return message


def smtp_transport(server: str, port: int, smtp_type: str = "SSL") -> Transport:
    """The reference's two connection modes (`tasks.py:220-227`):
    implicit-TLS (``SSL``) or upgrade-after-connect (``STARTTLS``);
    anything else is a ValueError, as there."""
    context = ssl.create_default_context()
    if smtp_type == "SSL":
        return smtplib.SMTP_SSL(server, port, context=context)
    if smtp_type == "STARTTLS":
        conn = smtplib.SMTP(server, port)
        conn.starttls(context=context)
        return conn
    raise ValueError(f"{smtp_type} is an unsupported value for smtp_type")


def send_report(
    report: EmailReport,
    username: str,
    password: str,
    transport_factory: Callable[[], Transport],
) -> MIMEMultipart:
    """Login → send → quit, with quit guaranteed (`tasks.py:229-233`).

    ``transport_factory`` is the seam: production passes
    ``lambda: smtp_transport(host, port, mode)``; tests pass a recorder.
    Returns the built message for assertion/inspection.
    """
    message = report.build_message()
    transport = transport_factory()
    transport.login(username, password)
    try:
        transport.send_message(message)
    finally:
        transport.quit()
    return message
