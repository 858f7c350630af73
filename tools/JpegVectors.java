// External JPEG test-vector generator (run once, outputs committed).
//
// Uses the JDK's javax.imageio JPEG codec — an implementation entirely
// independent of smcchecker_spark.jpegcodec — to produce
// (a) baseline JPEG bitstreams our encoder did NOT produce, plus the
//     reference decoder's own decoded RGB for them, and
// (b) reference-decoded RGB for bitstreams OUR encoder produced
//     (bidirectional interop).
//
// Usage:
//   java tools/JpegVectors.java encode <h> <w> <seed> <quality> <out.jpg> <out.rgb>
//       deterministically generates an RGB image (xorshift pattern),
//       encodes it with ImageIO at <quality>, writes the JPEG bytes to
//       out.jpg, then DECODES those bytes back with ImageIO and writes
//       the decoded pixels (h*w*3 bytes, row-major RGB) to out.rgb
//   java tools/JpegVectors.java decode <in.jpg> <out.rgb>
//       decodes in.jpg with ImageIO and writes h*w*3 RGB bytes
//       (prefixed by two 4-byte big-endian ints: h, w)

import java.awt.image.BufferedImage;
import java.io.ByteArrayOutputStream;
import java.io.File;
import java.io.FileOutputStream;
import java.nio.file.Files;
import javax.imageio.IIOImage;
import javax.imageio.ImageIO;
import javax.imageio.ImageWriteParam;
import javax.imageio.ImageWriter;
import javax.imageio.stream.MemoryCacheImageOutputStream;

public class JpegVectors {
    // deterministic pixel pattern: xorshift32 per (y, x, c) from seed
    static int pix(long seed, int y, int x, int c) {
        long v = seed * 1000003L + (long) y * 8191L + (long) x * 131L + c;
        v ^= v << 13; v &= 0xFFFFFFFFL;
        v ^= v >>> 17;
        v ^= v << 5; v &= 0xFFFFFFFFL;
        return (int) (v & 0xFF);
    }

    public static void main(String[] args) throws Exception {
        if (args[0].equals("encode") || args[0].equals("encodeprog")) {
            int h = Integer.parseInt(args[1]);
            int w = Integer.parseInt(args[2]);
            long seed = Long.parseLong(args[3]);
            float q = Float.parseFloat(args[4]);
            BufferedImage img =
                new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB);
            for (int y = 0; y < h; y++)
                for (int x = 0; x < w; x++) {
                    // smooth base + deterministic noise: JPEG-friendly
                    int base = (x * 5 + y * 3) & 0xFF;
                    int r = Math.min(255, (base + pix(seed, y, x, 0) / 8));
                    int g = Math.min(255, (base + pix(seed, y, x, 1) / 8));
                    int b = Math.min(255, (base + pix(seed, y, x, 2) / 8));
                    img.setRGB(x, y, (r << 16) | (g << 8) | b);
                }
            ImageWriter wr = ImageIO.getImageWritersByFormatName("jpeg").next();
            ImageWriteParam p = wr.getDefaultWriteParam();
            p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT);
            p.setCompressionQuality(q);
            if (args[0].equals("encodeprog"))
                p.setProgressiveMode(ImageWriteParam.MODE_DEFAULT);
            ByteArrayOutputStream bos = new ByteArrayOutputStream();
            wr.setOutput(new MemoryCacheImageOutputStream(bos));
            wr.write(null, new IIOImage(img, null, null), p);
            wr.dispose();
            byte[] jpg = bos.toByteArray();
            try (FileOutputStream f = new FileOutputStream(args[5])) {
                f.write(jpg);
            }
            dumpDecoded(jpg, args[6]);
        } else {
            byte[] jpg = Files.readAllBytes(new File(args[1]).toPath());
            dumpDecoded(jpg, args[2]);
        }
    }

    static void dumpDecoded(byte[] jpg, String outPath) throws Exception {
        BufferedImage dec =
            ImageIO.read(new java.io.ByteArrayInputStream(jpg));
        int h = dec.getHeight(), w = dec.getWidth();
        byte[] out = new byte[8 + h * w * 3];
        out[0] = (byte) (h >>> 24); out[1] = (byte) (h >>> 16);
        out[2] = (byte) (h >>> 8);  out[3] = (byte) h;
        out[4] = (byte) (w >>> 24); out[5] = (byte) (w >>> 16);
        out[6] = (byte) (w >>> 8);  out[7] = (byte) w;
        int i = 8;
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++) {
                int rgb = dec.getRGB(x, y);
                out[i++] = (byte) (rgb >>> 16);
                out[i++] = (byte) (rgb >>> 8);
                out[i++] = (byte) rgb;
            }
        try (FileOutputStream f = new FileOutputStream(outPath)) {
            f.write(out);
        }
    }
}
