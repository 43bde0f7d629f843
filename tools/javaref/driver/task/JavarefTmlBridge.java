package task;

import java.io.File;
import java.util.List;

import parser.TXPParser;
import parser.TimeMLParser;

/** Same-package bridge: TempEval3TaskABC is package-private, so the
 *  golden driver reaches writeTimeMLFile through this shim. */
public class JavarefTmlBridge {
    public static void writeTimeML(TXPParser txpParser, String txpPath,
            TimeMLParser tmlParser, String tmlPath,
            List<String> tt, List<String> et, List<String> ee,
            String outDir) throws Exception {
        TempEval3TaskABC abc = new TempEval3TaskABC();
        abc.writeTimeMLFile(txpParser, new File(txpPath), tmlParser,
                new File(tmlPath), tt, et, ee, outDir);
    }
}
