"""SMTP notification adapter (reference main.py:374-419).

The reference builds an ``EmailMessage`` and sends it through
``smtplib.SMTP_SSL`` with a login, degrading to a logged warning when
the .env settings are incomplete (main.py:379-382). This adapter keeps
that shape — stdlib only — and is injectable as ``run_pipeline``'s
``notify=`` callable: it receives the rendered report body
(``render_email_body``) and carries it as a plaintext message whose
Subject is the body's first line (the reference's subject likewise
embeds the report date).

TLS modes: ``ssl=True`` → SMTP_SSL (the reference's mode, port 465
convention); ``starttls=True`` → plain connect then STARTTLS (port
587 convention); both false → cleartext, which is what the
in-process test server speaks. Login only happens when a password is
configured, so unauthenticated relays (and the test server) work.
"""

from __future__ import annotations

import logging
import os
import smtplib
import ssl
from dataclasses import dataclass
from email.message import EmailMessage

log = logging.getLogger(__name__)


@dataclass
class SmtpNotifier:
    host: str
    sender: str
    receiver: str
    port: int = 0  # 0 → smtplib picks the scheme default
    password: str | None = None
    use_ssl: bool = False
    use_starttls: bool = False
    timeout: float = 10.0

    @classmethod
    def from_env(cls) -> "SmtpNotifier | None":
        """Build from SPARK_GRAFT_SMTP_{HOST,PORT,SENDER,RECEIVER,
        PASSWORD,MODE}; returns None when host/sender/receiver is
        missing — the reference's incomplete-settings warn+skip
        (main.py:379-382)."""
        host = os.environ.get("SPARK_GRAFT_SMTP_HOST", "")
        sender = os.environ.get("SPARK_GRAFT_SMTP_SENDER", "")
        receiver = os.environ.get("SPARK_GRAFT_SMTP_RECEIVER", "")
        if not host or not sender or not receiver:
            log.warning("Email settings incomplete; skipping notification")
            return None
        mode = os.environ.get("SPARK_GRAFT_SMTP_MODE", "ssl").lower()
        return cls(
            host=host,
            sender=sender,
            receiver=receiver,
            port=int(os.environ.get("SPARK_GRAFT_SMTP_PORT", "0") or 0),
            password=os.environ.get("SPARK_GRAFT_SMTP_PASSWORD") or None,
            use_ssl=mode == "ssl",
            use_starttls=mode == "starttls",
        )

    def build_message(self, body: str) -> EmailMessage:
        msg = EmailMessage()
        first = body.strip().splitlines()[0] if body.strip() else "Daily Report"
        msg["Subject"] = first
        msg["From"] = self.sender
        msg["To"] = self.receiver
        msg.set_content(body)
        return msg

    def __call__(self, body: str) -> None:
        msg = self.build_message(body)
        if self.use_ssl:
            ctx = ssl.create_default_context()
            server: smtplib.SMTP = smtplib.SMTP_SSL(
                self.host, self.port, timeout=self.timeout, context=ctx
            )
        else:
            server = smtplib.SMTP(self.host, self.port, timeout=self.timeout)
        try:
            if self.use_starttls:
                server.starttls(context=ssl.create_default_context())
            if self.password:
                server.login(self.sender, self.password)
            server.send_message(msg)
            log.info("notification sent to %s", self.receiver)
        finally:
            try:
                server.quit()
            except smtplib.SMTPException:
                server.close()
