"""Filesystem seam for table metadata / spool bookkeeping (R8 sink, R15).

``ParquetUpsertTable``'s commit-log / spool operations are
directory-level metadata I/O: tiny immutable record files, listings,
recursive deletes, and parquet-footer row counts. The DATA path
(reading/writing bucket parquet) already goes through Spark and therefore
through whatever cluster filesystem Spark is configured for — but until
this seam the METADATA path was hardwired to driver-local ``os``/``shutil``,
which is exactly the gap between a 100 TB design argument and 100 TB design
code: on a real cluster the table root lives on shared storage
(hdfs:// / s3a:// / abfs://) and the driver must do its bookkeeping through
the Hadoop FileSystem API, the same client Spark's own committers use
(reference sink contract: /root/reference/README.md:840-842 — the JDBC sink
database is durable shared state; this table is its Spark-native stand-in).

Two implementations of one deliberately tiny contract:

- :class:`LocalFS` — ``os``/``shutil``/``pyarrow``. The default: zero JVM
  round-trips per call, right for local tables, tests, and this build.
- :class:`HadoopFS` — ``org.apache.hadoop.fs.FileSystem`` obtained from the
  live SparkSession's JVM via py4j, so every scheme Spark can write
  (hdfs, s3a, abfs, gs, file, ...) works with no extra Python deps;
  footer row counts use parquet-hadoop's ``ParquetFileReader`` (bundled
  with Spark), reading footers only, never data pages.

Object-store notes (honest contract, same as Delta's):

- ``write_text_atomic`` (write-temp + rename) is atomic on HDFS and local
  disk but copy+delete on S3A — it remains in the contract ONLY for
  single-writer, last-value state (the R14 JDBC watermark, whose recovery
  is re-poll + idempotent merge). Table COMMITS no longer use it: the
  sink's commit protocol is an append-only log of ``create_exclusive``
  records (see ``streaming/materialize.py``), because put-if-absent is
  the one primitive object stores do offer (S3 conditional PUT /
  ``If-None-Match``, GCS ``x-goog-if-generation-match: 0``).
- ``create_exclusive`` is the commit primitive: atomically publish a
  COMPLETE file iff the path does not exist. LocalFS: write-temp +
  ``os.link`` (hardlink creation is atomic and fails on existing dst).
  HadoopFS: write-temp + ``FileContext.rename`` WITHOUT overwrite — a
  single atomic namespace op on HDFS (the primitive Delta's HDFSLogStore
  uses); schemes with no AbstractFileSystem binding (commonly s3a unless
  ``fs.AbstractFileSystem.s3a.impl`` is configured) fall back to
  ``FileSystem.create(path, overwrite=false)`` — content is atomic there
  because the object only becomes visible at close-time PUT, but the
  no-overwrite FENCE is server-enforced only where the client supports
  conditional writes (S3A on Hadoop >= 3.4.1 / If-None-Match); older
  clients check client-side and a one-time RuntimeWarning is emitted on
  that path (ADVICE r13).
"""

from __future__ import annotations

import itertools
import os
import shutil

#: distinguishes concurrent temp files from one driver process (the pid
#: alone is shared by all of a driver's handles)
_TMP_SEQ = itertools.count()


class LocalFS:
    """Driver-local filesystem bookkeeping (default; plain ``os`` calls)."""

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def is_dir(self, path: str) -> bool:
        return os.path.isdir(path)

    def mkdirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def write_text_atomic(self, path: str, text: str) -> None:
        """Durably publish ``text`` at ``path`` via write-temp + atomic rename
        — readers see the old content or the new, never a torn write.
        Missing parent directories are created (both impls)."""
        parent = os.path.dirname(path)
        if parent:
            os.makedirs(parent, exist_ok=True)
        tmp = f"{path}.tmp"
        try:
            with open(tmp, "w") as f:
                f.write(text)
            os.replace(tmp, path)
        except BaseException:
            try:  # same no-temp-litter rule as create_exclusive
                os.remove(tmp)
            except OSError:
                pass
            raise

    def create_exclusive(self, path: str, text: str) -> bool:
        """Put-if-absent: publish ``text`` at ``path`` iff it doesn't exist.

        Returns True when this call created the file, False when the path
        already existed (another writer won). The published file is always
        COMPLETE — content is written to a temp file first and linked into
        place with ``os.link``, which is a single atomic namespace op that
        fails on an existing destination; a reader can never observe a
        torn record, and two racers can never both return True.

        REQUIRES hardlink support on the target filesystem (true for the
        declared LocalFS contract: driver-local disk). On link-less mounts
        sometimes used as "local" paths (some FUSE/NFS/object-store
        gateways) ``os.link`` raises OSError rather than degrading — route
        such paths through :class:`HadoopFS` instead, whose fallback chain
        handles stores without a link/rename primitive.
        """
        parent = os.path.dirname(path)
        if parent:
            os.makedirs(parent, exist_ok=True)
        tmp = f"{path}.{os.getpid()}.{next(_TMP_SEQ)}.tmp"
        try:
            with open(tmp, "w") as f:
                f.write(text)
            os.link(tmp, path)
            return True
        except FileExistsError:
            return False
        finally:
            # the temp never outlives ANY exit — including a failed
            # content write (disk full), which previously left uniquely
            # named .tmp litter in the log dir that no vacuum collects
            try:
                os.remove(tmp)
            except OSError:
                pass

    def list_names(self, path: str) -> list[str]:
        """Child basenames of ``path`` ([] when missing or not a dir)."""
        if not os.path.isdir(path):
            return []
        return sorted(os.listdir(path))

    def delete(self, path: str) -> None:
        """Best-effort recursive delete of a file or dir tree, missing-ok.

        Cleanup-only contract (spool clear, vacuum victims) — never
        load-bearing for commit correctness, so failures are swallowed on
        both impls; a leftover path is re-collected by the next cleanup.
        """
        try:
            if os.path.isdir(path):
                shutil.rmtree(path, ignore_errors=True)
            elif os.path.exists(path):
                os.remove(path)
        except OSError:
            pass

    def mtime(self, path: str) -> float:
        """Last-modification time of ``path`` in seconds since the epoch
        (the age signal for orphan cleanup — see
        ``ParquetUpsertTable.vacuum_orphans``)."""
        return os.path.getmtime(path)

    def parquet_rows(self, path: str) -> int:
        """Total row count under ``path`` from parquet FOOTERS only — no
        Spark jobs, no data pages (the spool's incremental-counter seed)."""
        import pyarrow.parquet as pq

        n = 0
        for dirpath, _dirs, names in os.walk(path):
            for f in names:
                if f.endswith(".parquet"):
                    n += pq.ParquetFile(os.path.join(dirpath, f)).metadata.num_rows
        return n


class HadoopFS:
    """Cluster-filesystem bookkeeping via the Hadoop FileSystem API.

    Resolves each path against the session's Hadoop configuration, so a
    table rooted at ``hdfs://...`` or ``s3a://...`` routes to that store
    while plain paths keep resolving to the local scheme — behaviour is
    byte-identical to :class:`LocalFS` on local paths (pytest-verified in
    ``tests/test_fs_seam.py``, which runs the full merge/spool/replay flow
    through both implementations and compares state).
    """

    def __init__(self, spark):
        self._jvm = spark._jvm
        self._gateway = spark.sparkContext._gateway
        self._conf = spark._jsc.hadoopConfiguration()
        self._fc = None  # lazy FileContext (only the pointer swap needs it)
        #: schemes FileContext refused (no AbstractFileSystem binding) —
        #: later create_exclusive calls skip straight to the object-store
        #: path instead of uploading a doomed temp file first (ADVICE r13)
        self._fc_unsupported: set[str] = set()

    # -- JVM plumbing -------------------------------------------------------
    def _path(self, p: str):
        return self._jvm.org.apache.hadoop.fs.Path(p)

    def _fs(self, jpath):
        return jpath.getFileSystem(self._conf)

    # -- contract -----------------------------------------------------------
    def exists(self, path: str) -> bool:
        p = self._path(path)
        return self._fs(p).exists(p)

    def is_dir(self, path: str) -> bool:
        """False when missing — including a path that vanishes between a
        caller's listing and this check (concurrent vacuum/sweep), which
        getFileStatus reports as a Java FileNotFoundException; LocalFS
        returns False there, so normalize rather than leak Py4JJavaError
        past the seam (the ADVICE r13 parity rule)."""
        p = self._path(path)
        try:
            return self._fs(p).getFileStatus(p).isDirectory()
        except Exception as e:
            if self._is_java(e, "FileNotFoundException"):
                return False
            raise

    def mkdirs(self, path: str) -> None:
        p = self._path(path)
        self._fs(p).mkdirs(p)

    def read_text(self, path: str) -> str:
        """Read a whole text file. A missing path raises the PYTHON
        ``FileNotFoundError`` (an OSError), not the raw py4j-wrapped
        ``java.io.FileNotFoundException`` — callers that tolerate
        missing-file races (a commit record deleted by a concurrent
        vacuum between listing and read, ``materialize._record``) catch
        OSError and must behave identically on both seam impls
        (ADVICE r13)."""
        p = self._path(path)
        try:
            stream = self._fs(p).open(p)
        except Exception as e:
            if self._is_java(e, "FileNotFoundException"):
                raise FileNotFoundError(path) from e
            raise
        try:
            return self._jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"
            )
        finally:
            stream.close()

    def _write_tmp(self, path: str, text: str):
        """Write ``text`` to a unique temp sibling of ``path``; returns
        (tmp_jpath, dst_jpath)."""
        tmp = self._path(f"{path}.{os.getpid()}.{next(_TMP_SEQ)}.tmp")
        dst = self._path(path)
        out = self._fs(tmp).create(tmp, True)
        try:
            try:
                out.write(bytearray(text.encode("utf-8")))
            finally:
                out.close()
        except Exception:
            # No temp litter on a failed write/close (r15 ADVICE): delete
            # the partial temp before re-raising, mirroring the
            # create_exclusive object-store path and the LocalFS rule —
            # a finalized partial temp would otherwise sit next to real
            # state files until a vacuum sweep.
            try:
                self._fs(tmp).delete(tmp, False)
            except Exception:
                pass  # best-effort cleanup; the original error propagates
            raise
        return tmp, dst

    def _file_context(self):
        if self._fc is None:
            self._fc = self._jvm.org.apache.hadoop.fs.FileContext.getFileContext(
                self._conf
            )
        return self._fc

    @staticmethod
    def _java_classes(err: Exception) -> list[str]:
        """Fully-qualified class names of a py4j-raised Java exception and
        its cause chain (bounded), ``[]`` for non-py4j errors. Classifying
        on the CLASS, not on ``str(err)``, matters: the py4j string embeds
        the whole Java stack trace, so substring checks can match phrases
        from an UNRELATED frame (ADVICE r14 — e.g. a lease error whose
        trace mentions another path 'already exists' must not be read as
        a lost put-if-absent race)."""
        names: list[str] = []
        je = getattr(err, "java_exception", None)
        for _ in range(8):  # bounded cause-chain walk
            if je is None:
                break
            try:
                names.append(str(je.getClass().getName()))
                je = je.getCause()
            except Exception:
                break
        return names

    @classmethod
    def _is_java(cls, err: Exception, needle: str) -> bool:
        """True when a py4j-raised Java exception's class chain names
        ``needle`` (e.g. 'UnsupportedFileSystemException'). Falls back to
        a string match only for non-py4j errors (where no class chain is
        available)."""
        names = cls._java_classes(err)
        if names:
            return any(needle in n for n in names)
        return needle in str(err)

    @classmethod
    def _is_lost_race(cls, err: Exception) -> bool:
        """True iff ``err`` means the put-if-absent destination already
        exists — a LOST RACE, the one failure :meth:`create_exclusive`
        maps to ``False``. Matches the Java exception class chain
        (``org.apache.hadoop.fs.FileAlreadyExistsException``,
        ``java.nio.file.FileAlreadyExistsException``,
        ``o.a.h.fs.PathExistsException``); the 'already exists' substring
        is consulted only for non-py4j errors, so an unrelated Java fault
        whose stack trace happens to contain the phrase re-raises instead
        of being silently converted into a misleading 'concurrent writer'
        report (ADVICE r14)."""
        names = cls._java_classes(err)
        if names:
            return any(
                n.endswith("FileAlreadyExistsException")
                or n.endswith("PathExistsException")
                for n in names
            )
        s = str(err)
        return "FileAlreadyExistsException" in s or "already exists" in s

    def write_text_atomic(self, path: str, text: str) -> None:
        """Write-temp + ``FileContext.rename(OVERWRITE)`` — atomic on HDFS
        (single namespace op), the primitive Delta's HDFSLogStore uses.

        Schemes with no AbstractFileSystem binding (commonly s3a unless
        ``fs.AbstractFileSystem.s3a.impl`` is configured) raise
        ``UnsupportedFileSystemException`` from FileContext; fall back to
        ``FileSystem.delete + rename`` there — NOT atomic (a reader can
        observe the gap), acceptable only because every remaining caller
        of this method is single-writer last-value state (ADVICE r12);
        table commits go through :meth:`create_exclusive` instead.
        """
        tmp, dst = self._write_tmp(path, text)
        try:
            rename_cls = self._jvm.org.apache.hadoop.fs.Options.Rename
            opts = self._gateway.new_array(rename_cls, 1)
            opts[0] = rename_cls.OVERWRITE
            self._file_context().rename(tmp, dst, opts)
        except Exception as e:
            if not self._is_java(e, "UnsupportedFileSystemException"):
                try:  # same no-temp-litter rule as create_exclusive
                    self._fs(tmp).delete(tmp, False)
                except Exception:
                    pass
                raise
            fs = self._fs(dst)
            if fs.exists(dst):
                fs.delete(dst, False)
            # FileSystem.rename signals failure by returning FALSE, not by
            # raising — swallowing it would report the state write as done
            # while the file still holds the old value (or none, after the
            # delete above): a JDBC watermark that silently never advances
            if not fs.rename(tmp, dst):
                try:
                    fs.delete(tmp, False)
                except Exception:
                    pass
                raise OSError(
                    f"atomic write of {path} failed: FileSystem.rename "
                    f"returned false on the non-FileContext fallback"
                )

    def create_exclusive(self, path: str, text: str) -> bool:
        """Put-if-absent: write-temp + ``FileContext.rename`` with NO
        overwrite option — one atomic namespace op on HDFS that fails with
        ``FileAlreadyExistsException`` when the destination exists, so the
        published record is complete-or-absent and two racers can't both
        win. On schemes without an AbstractFileSystem binding, falls back
        to ``FileSystem.create(path, overwrite=false)`` — the object-store
        shape: S3A publishes content atomically at close-time PUT.

        HONEST FENCE CONTRACT on the fallback (ADVICE r13): the
        no-overwrite condition is only enforced SERVER-side where the
        store supports conditional writes (S3A on Hadoop >= 3.4.1 uses
        If-None-Match). Older S3A clients enforce it client-side
        (HEAD-then-PUT), which reopens a small race window in which two
        committers can both return True and one record is silently
        overwritten. A one-time warning is emitted the first time a
        scheme takes this path so operators can confirm their client
        version; HDFS/local rename paths are unaffected.

        The temp file never outlives a failure: every exit from the
        rename path — lost race, unsupported scheme, or an unexpected
        error re-raise — drops it (ADVICE r13), and once a scheme is
        known FileContext-unsupported later calls skip the temp upload
        entirely instead of paying the content write twice.
        """
        dst = self._path(path)
        scheme = str(dst.toUri().getScheme())
        if scheme not in self._fc_unsupported:
            tmp, dst = self._write_tmp(path, text)
            try:
                rename_cls = self._jvm.org.apache.hadoop.fs.Options.Rename
                opts = self._gateway.new_array(rename_cls, 1)
                opts[0] = rename_cls.NONE
                self._file_context().rename(tmp, dst, opts)
                return True
            except Exception as e:
                try:  # drop the temp on EVERY failure path, then classify
                    self._fs(tmp).delete(tmp, False)
                except Exception:
                    pass
                if self._is_lost_race(e):
                    return False  # lost the race
                if not self._is_java(e, "UnsupportedFileSystemException"):
                    raise
                self._fc_unsupported.add(scheme)
                import warnings

                warnings.warn(
                    f"create_exclusive on scheme {scheme!r} has no "
                    f"FileContext binding; falling back to "
                    f"FileSystem.create(overwrite=false). The put-if-absent "
                    f"fence is only server-enforced where the store supports "
                    f"conditional writes (e.g. S3A on Hadoop >= 3.4.1 "
                    f"If-None-Match) — on older clients the check is "
                    f"client-side and two racing committers may both "
                    f"succeed.",
                    RuntimeWarning,
                    stacklevel=2,
                )
        # object-store path: stream straight into a no-overwrite create
        fs = self._fs(dst)
        try:
            out = fs.create(dst, False)
        except Exception as e2:
            if self._is_lost_race(e2):
                return False
            raise
        try:
            out.write(bytearray(text.encode("utf-8")))
            out.close()
        except Exception:
            # closing after a failed write would FINALIZE the PUT and
            # publish a truncated record at the commit slot — the torn
            # head that needs manual recovery. Close to release the
            # handle, then withdraw whatever partial object became
            # visible, so a transient write error stays transient.
            try:
                out.close()
            except Exception:
                pass
            try:
                fs.delete(dst, False)
            except Exception:
                pass
            raise
        return True

    def list_names(self, path: str) -> list[str]:
        """[] when missing OR not a dir — Hadoop's listStatus on a FILE
        returns the file itself; LocalFS returns [], so match that. Also
        [] when the path vanishes between the status and list calls (a
        concurrent vacuum/sweep) — LocalFS's isdir/listdir pair returns
        [] in that race, so the Java FileNotFoundException is normalized
        instead of leaking Py4JJavaError past the seam."""
        p = self._path(path)
        fs = self._fs(p)
        try:
            if not fs.getFileStatus(p).isDirectory():
                return []
            return sorted(s.getPath().getName() for s in fs.listStatus(p))
        except Exception as e:
            if self._is_java(e, "FileNotFoundException"):
                return []
            raise

    def delete(self, path: str) -> None:
        """Best-effort, missing-ok (same cleanup-only contract as LocalFS)."""
        try:
            p = self._path(path)
            fs = self._fs(p)
            if fs.exists(p):
                fs.delete(p, True)
        except Exception:
            pass

    def mtime(self, path: str) -> float:
        """Last-modification time in epoch seconds (Hadoop reports millis).
        Missing paths raise ``FileNotFoundError`` — the same OSError
        LocalFS raises — so callers' vanished-between-list-and-stat
        handling behaves identically on both impls (seam-parity rule,
        ADVICE r13)."""
        p = self._path(path)
        fs = self._fs(p)
        try:
            return fs.getFileStatus(p).getModificationTime() / 1000.0
        except Exception as e:
            if self._is_java(e, "FileNotFoundException"):
                raise FileNotFoundError(path) from e
            raise

    def parquet_rows(self, path: str) -> int:
        """Footer-only row count via parquet-hadoop (no jobs, no data pages)
        — works against any Hadoop-visible store, not just local disk."""
        p = self._path(path)
        fs = self._fs(p)
        if not fs.exists(p):
            return 0
        reader_cls = self._jvm.org.apache.parquet.hadoop.ParquetFileReader
        input_file = self._jvm.org.apache.parquet.hadoop.util.HadoopInputFile
        n = 0
        it = fs.listFiles(p, True)
        while it.hasNext():
            f = it.next()
            if f.getPath().getName().endswith(".parquet"):
                r = reader_cls.open(input_file.fromPath(f.getPath(), self._conf))
                try:
                    n += r.getRecordCount()
                finally:
                    r.close()
        return n
