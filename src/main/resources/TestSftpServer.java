import java.io.*;
import java.nio.file.*;
import java.util.*;

/**
 * Minimal SFTP v3 server speaking the stdio framing the OpenSSH client's
 * {@code -D} flag expects — the interop fixture for graft's SshSource
 * specs (no sshd exists in the test environment; the REAL OpenSSH sftp
 * client connects to this process directly, so the protocol bytes on
 * the wire are produced/consumed by openssh itself on one side).
 *
 * Implements the read-only subset a recursive {@code get -R} needs:
 * INIT/VERSION, REALPATH, STAT/LSTAT/FSTAT, OPENDIR/READDIR/CLOSE,
 * OPEN(read)/READ. Everything else answers SSH_FX_OP_UNSUPPORTED.
 * Protocol reference: draft-ietf-secsh-filexfer-02 (the v3 wire format
 * OpenSSH implements).
 *
 * Usage: java TestSftpServer.java <rootDir>   (paths are served as-is;
 * the root confines nothing — this is a test fixture, not a daemon)
 */
public class TestSftpServer {
  static DataInputStream in;
  static DataOutputStream out;
  static Map<String, Object> handles = new HashMap<>();
  static int nextHandle = 1;

  public static void main(String[] args) throws Exception {
    in = new DataInputStream(new BufferedInputStream(System.in));
    out = new DataOutputStream(new BufferedOutputStream(System.out));
    while (true) {
      int len;
      try { len = in.readInt(); } catch (EOFException e) { return; }
      byte[] pkt = new byte[len];
      in.readFully(pkt);
      handle(pkt);
      out.flush();
    }
  }

  static void handle(byte[] pkt) throws IOException {
    DataInputStream p = new DataInputStream(new ByteArrayInputStream(pkt));
    int type = p.readUnsignedByte();
    if (type == 1) { // INIT
      ByteArrayOutputStream b = new ByteArrayOutputStream();
      DataOutputStream d = new DataOutputStream(b);
      d.writeByte(2); d.writeInt(3); // VERSION 3
      send(b.toByteArray());
      return;
    }
    int id = p.readInt();
    try {
      switch (type) {
        case 16: { // REALPATH
          String path = str(p);
          Path rp = Paths.get(path.isEmpty() || path.equals(".") ? "/" : path).normalize();
          String canon = rp.toString().isEmpty() ? "/" : rp.toString();
          sendName(id, new String[]{canon}, new Path[]{null});
          break;
        }
        case 7: case 17: { // LSTAT / STAT
          Path f = Paths.get(str(p));
          if (!Files.exists(f)) sendStatus(id, 2, "no such file");
          else sendAttrs(id, f);
          break;
        }
        case 8: { // FSTAT
          Object h = handles.get(str(p));
          if (h instanceof FileChannelHolder) sendAttrs(id, ((FileChannelHolder) h).path);
          else if (h instanceof DirHolder) sendAttrs(id, ((DirHolder) h).path);
          else sendStatus(id, 4, "bad handle");
          break;
        }
        case 11: { // OPENDIR
          Path f = Paths.get(str(p));
          if (!Files.isDirectory(f)) { sendStatus(id, 2, "not a directory"); break; }
          String h = "h" + (nextHandle++);
          handles.put(h, new DirHolder(f));
          sendHandle(id, h);
          break;
        }
        case 12: { // READDIR
          Object ho = handles.get(str(p));
          if (!(ho instanceof DirHolder)) { sendStatus(id, 4, "bad handle"); break; }
          DirHolder dh = (DirHolder) ho;
          if (dh.sent) { sendStatus(id, 1, "eof"); break; }
          dh.sent = true;
          List<Path> entries = new ArrayList<>();
          try (DirectoryStream<Path> ds = Files.newDirectoryStream(dh.path)) {
            for (Path e : ds) entries.add(e);
          }
          String[] names = new String[entries.size()];
          Path[] paths = new Path[entries.size()];
          for (int i = 0; i < entries.size(); i++) {
            names[i] = entries.get(i).getFileName().toString();
            paths[i] = entries.get(i);
          }
          sendName(id, names, paths);
          break;
        }
        case 3: { // OPEN (read-only subset)
          String path = str(p);
          Path f = Paths.get(path);
          if (!Files.isRegularFile(f)) { sendStatus(id, 2, "no such file"); break; }
          String h = "h" + (nextHandle++);
          handles.put(h, new FileChannelHolder(f));
          sendHandle(id, h);
          break;
        }
        case 5: { // READ
          Object ho = handles.get(str(p));
          long off = p.readLong();
          int want = p.readInt();
          if (!(ho instanceof FileChannelHolder)) { sendStatus(id, 4, "bad handle"); break; }
          byte[] data = ((FileChannelHolder) ho).bytes;
          if (off >= data.length) { sendStatus(id, 1, "eof"); break; }
          int n = (int) Math.min(want, data.length - off);
          ByteArrayOutputStream b = new ByteArrayOutputStream();
          DataOutputStream d = new DataOutputStream(b);
          d.writeByte(103); d.writeInt(id); d.writeInt(n);
          d.write(data, (int) off, n);
          send(b.toByteArray());
          break;
        }
        case 4: { // CLOSE
          handles.remove(str(p));
          sendStatus(id, 0, "ok");
          break;
        }
        default:
          sendStatus(id, 8, "unsupported op " + type);
      }
    } catch (Exception e) {
      sendStatus(id, 4, String.valueOf(e));
    }
  }

  static class DirHolder { Path path; boolean sent; DirHolder(Path p) { path = p; } }
  static class FileChannelHolder {
    Path path; byte[] bytes;
    FileChannelHolder(Path p) throws IOException { path = p; bytes = Files.readAllBytes(p); }
  }

  static String str(DataInputStream p) throws IOException {
    int n = p.readInt();
    byte[] b = new byte[n];
    p.readFully(b);
    return new String(b, java.nio.charset.StandardCharsets.UTF_8);
  }

  static void send(byte[] payload) throws IOException {
    out.writeInt(payload.length);
    out.write(payload);
  }

  static void sendStatus(int id, int code, String msg) throws IOException {
    ByteArrayOutputStream b = new ByteArrayOutputStream();
    DataOutputStream d = new DataOutputStream(b);
    d.writeByte(101); d.writeInt(id); d.writeInt(code);
    wstr(d, msg); wstr(d, "en");
    send(b.toByteArray());
  }

  static void sendHandle(int id, String h) throws IOException {
    ByteArrayOutputStream b = new ByteArrayOutputStream();
    DataOutputStream d = new DataOutputStream(b);
    d.writeByte(102); d.writeInt(id); wstr(d, h);
    send(b.toByteArray());
  }

  static void writeAttrs(DataOutputStream d, Path f) throws IOException {
    if (f == null) { d.writeInt(0); return; }
    boolean dir = Files.isDirectory(f);
    long size = dir ? 0 : Files.size(f);
    d.writeInt(0x1 | 0x4); // SIZE | PERMISSIONS
    d.writeLong(size);
    d.writeInt(dir ? 040755 : 0100644);
  }

  static void sendAttrs(int id, Path f) throws IOException {
    ByteArrayOutputStream b = new ByteArrayOutputStream();
    DataOutputStream d = new DataOutputStream(b);
    d.writeByte(105); d.writeInt(id); writeAttrs(d, f);
    send(b.toByteArray());
  }

  static void sendName(int id, String[] names, Path[] paths) throws IOException {
    ByteArrayOutputStream b = new ByteArrayOutputStream();
    DataOutputStream d = new DataOutputStream(b);
    d.writeByte(104); d.writeInt(id); d.writeInt(names.length);
    for (int i = 0; i < names.length; i++) {
      wstr(d, names[i]);
      boolean dir = paths[i] != null && Files.isDirectory(paths[i]);
      long size = paths[i] == null || dir ? 0 : Files.size(paths[i]);
      wstr(d, (dir ? "d" : "-") + "rw-r--r--    1 u g " + size + " Jan  1 00:00 " + names[i]);
      writeAttrs(d, paths[i]);
    }
    send(b.toByteArray());
  }

  static void wstr(DataOutputStream d, String s) throws IOException {
    byte[] b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8);
    d.writeInt(b.length);
    d.write(b);
  }
}
