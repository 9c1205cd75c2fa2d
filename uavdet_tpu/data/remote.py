"""Remote dataset access (reference's ``dataset.remote`` flag).

The reference streams images/annotations over SFTP with paramiko and .env
credentials (dataset/_helper.py:85-110, .env.example:1-4). Here remote
access is a pluggable filesystem object with {list_dir, isdir, exists,
load_json, load_image}; two backends:

* ``SFTPFileSystem`` — parity backend; requires paramiko (gated import) and
  SFTP_HOST/PORT/USERNAME/PASSWORD in the environment or a .env file.
* ``GCSFileSystem``  — the TPU-native equivalent (GCS paths); requires
  gcsfs/google-cloud-storage (gated import).
"""

import io
import json
import os


def _load_dotenv(path: str = ".env"):
    if not os.path.exists(path):
        return
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line and not line.startswith("#") and "=" in line:
                k, v = line.split("=", 1)
                os.environ.setdefault(k.strip(), v.strip())


class SFTPFileSystem:
    """SFTP-backed dataset filesystem (reference connect_sftp,
    dataset/_helper.py:85-110)."""

    def __init__(self):
        try:
            import paramiko
        except ImportError as e:
            raise RuntimeError(
                "dataset.remote=true needs paramiko (not available in this "
                "environment); install it or use a GCS path") from e
        _load_dotenv()
        client = paramiko.SSHClient()
        client.set_missing_host_key_policy(paramiko.AutoAddPolicy())
        client.connect(
            hostname=os.environ["SFTP_HOST"],
            port=int(os.environ.get("SFTP_PORT", 22)),
            username=os.environ["SFTP_USERNAME"],
            password=os.environ["SFTP_PASSWORD"])
        self._client = client
        self._sftp = client.open_sftp()

    def list_dir(self, path):
        return sorted(self._sftp.listdir(path))

    def isdir(self, path):
        import stat
        try:
            return stat.S_ISDIR(self._sftp.stat(path).st_mode)
        except IOError:
            return False

    def exists(self, path):
        try:
            self._sftp.stat(path)
            return True
        except IOError:
            return False

    def _read(self, path) -> bytes:
        with self._sftp.open(path, "rb") as f:
            f.prefetch()
            return f.read()

    def load_json(self, path):
        return json.loads(self._read(path))

    def load_image(self, path):
        import numpy as np
        from PIL import Image
        img = Image.open(io.BytesIO(self._read(path)))
        img.load()
        return np.asarray(img.convert("RGB"))

    def close(self):
        self._sftp.close()
        self._client.close()


class GCSFileSystem:
    """GCS-backed dataset filesystem (TPU-native remote storage)."""

    def __init__(self):
        try:
            import gcsfs
        except ImportError as e:
            raise RuntimeError(
                "GCS remote access needs gcsfs (not available in this "
                "environment)") from e
        self._fs = gcsfs.GCSFileSystem()

    def list_dir(self, path):
        return sorted(os.path.basename(p)
                      for p in self._fs.ls(path.replace("gs://", "")))

    def isdir(self, path):
        return self._fs.isdir(path.replace("gs://", ""))

    def exists(self, path):
        return self._fs.exists(path.replace("gs://", ""))

    def load_json(self, path):
        with self._fs.open(path.replace("gs://", ""), "rb") as f:
            return json.load(f)

    def load_image(self, path):
        import numpy as np
        from PIL import Image
        with self._fs.open(path.replace("gs://", ""), "rb") as f:
            img = Image.open(io.BytesIO(f.read()))
            img.load()
        return np.asarray(img.convert("RGB"))


def make_filesystem(root_dir: str, remote: bool):
    """Pick the filesystem backend for a dataset root."""
    if root_dir.startswith("gs://"):
        return GCSFileSystem()
    if remote:
        return SFTPFileSystem()
    return None
